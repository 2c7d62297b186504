"""bench.py timing policy — the pinned-gate band and the outlier
re-time rule are the honesty contract of every recorded
BENCH_FULL.json, so the decision functions are pinned here (pure
logic, no Spark — except TestWarmup, which smokes the warmup path
that gates the entire recording).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


class TestBreachesPin:
    def test_requires_both_ratio_and_absolute_slack(self):
        # 3x but only 0.2s over: sub-second jitter, not a breach
        assert not bench.breaches_pin(0.3, 0.1)
        # big absolute delta but under the ratio limit
        assert not bench.breaches_pin(5.9, 3.0)
        # both conditions met
        assert bench.breaches_pin(1.2, 0.4)

    def test_boundary_is_exclusive(self):
        # exactly 2x / exactly 0.3s over -> not a breach
        assert not bench.breaches_pin(1.0, 0.5)
        assert not bench.breaches_pin(0.5, 0.2)

    def test_flag_band_equals_retime_band(self):
        """The retime trigger and the flag gate share breaches_pin, so
        any flagged timing would have been re-timed first — a flag in
        BENCH_FULL.json always means slow on BOTH executions."""
        cases = [(2.61, 0.50), (1.18, 0.51), (0.45, 0.36), (10.0, 1.0)]
        for t, pin in cases:
            assert bench.breaches_pin(t, pin) == (
                t > bench.PIN_RATIO_LIMIT * pin
                and t - pin > bench.PIN_ABS_SLACK
            )


class TestBreachesPrev:
    def test_prev_band_is_15x_with_absolute_slack(self):
        """The flagged_vs_previous band: >1.5x AND >0.3s over. Since r7
        this band also triggers a cold re-time (VERDICT r6 ask #4), so
        any surviving flag was slow on BOTH executions."""
        assert bench.breaches_prev(1.64, 1.0)  # the r6 pseudo-drift shape
        assert not bench.breaches_prev(1.45, 1.0)  # under the ratio
        assert not bench.breaches_prev(0.5, 0.25)  # 2x but sub-slack
        # boundaries are exclusive
        assert not bench.breaches_prev(1.5, 1.0)
        assert not bench.breaches_prev(0.75, 0.5)


class TestRetimeDecision:
    def test_gc_oneoff_retry_accepted_and_floored_at_pin(self):
        # observed shape: 2.6s GC one-off over a 1.0s pin, 0.9s steady
        # retry (90% of pin). Recorded = min(first, max(retry, pin)):
        # the retry runs in a fully warmed process at the end of the
        # sweep, so recording it raw would drift totals and the next
        # round's `prev` downward (ADVICE r6 #2) — the floor is the pin.
        accepted, recorded = bench.retime_decision(2.6, 0.9, pinned=1.0)
        assert accepted and recorded == 1.0

    def test_retry_above_pin_records_the_min(self):
        # a steady-but-slower-than-pin retry is recorded as measured
        accepted, recorded = bench.retime_decision(2.6, 1.3, pinned=1.0)
        assert accepted and recorded == 1.3

    def test_warm_fixture_retry_rejected_keeps_first(self):
        # fixture-cache warm retry (milliseconds, ~4% of the pin) must
        # NOT smooth a cold-path regression away
        accepted, recorded = bench.retime_decision(3.0, 0.05, pinned=1.2)
        assert not accepted and recorded == 3.0

    def test_slower_retry_keeps_first(self):
        accepted, recorded = bench.retime_decision(1.0, 1.4, pinned=0.45)
        assert accepted and recorded == 1.0

    def test_warm_bar_boundary(self):
        frac = bench.RETIME_WARM_FRACTION
        accepted, _ = bench.retime_decision(2.5, frac, pinned=1.0)
        assert accepted  # exactly at the bar counts as a re-execution
        accepted, recorded = bench.retime_decision(2.5, frac - 1e-9, pinned=1.0)
        assert not accepted and recorded == 2.5

    def test_bar_is_pin_denominated_not_first_denominated(self):
        """Regression pin for the observed r6 misfire: pin 0.88s, GC-hit
        first sample 2.01s, genuine cold retry 0.46s. A first-sample-
        denominated bar (25% of 2.01 = 0.50) rejected the retry and left
        a spurious over-2x flag; the pin-denominated bar accepts it
        (0.46 = 53% of the pin). Since r7 the recorded value is the PIN,
        not the raw warm retry (ADVICE r6 #2 downward-drift guard)."""
        accepted, recorded = bench.retime_decision(2.009, 0.4647, pinned=0.8782)
        assert accepted and recorded == 0.8782

    def test_accepted_retime_never_records_below_the_pin(self):
        """Drift invariant (ADVICE r6 #2): for any accepted retime the
        recorded value is >= min(first, pin), so a sweep-warmed retry
        can never ratchet recorded totals below cold cost."""
        cases = [(2.6, 0.9, 1.0), (2.0, 0.5, 0.9), (3.1, 1.1, 1.0),
                 (1.64, 0.41, 1.0)]
        for first, retry, pin in cases:
            accepted, recorded = bench.retime_decision(first, retry, pin)
            if accepted:
                assert recorded >= min(first, pin)


class TestAmbientSentinel:
    """VERDICT r10 #2: the r10 driver recording was a +27% uniformly-hot
    run whose two nominal 2x-gate breaches measured the box, not the
    code. The sentinel times a fixed CPU loop at sweep start/end against
    the pinned idle reference and suppresses gate flags when degraded."""

    def test_degraded_past_threshold(self):
        # the r10 shape: ~26% uniform inflation on a 0.167s reference
        degraded, ratio = bench.ambient_verdict(0.211, 0.167)
        assert degraded and ratio == 1.263

    def test_idle_wander_not_degraded(self):
        # measured idle cross-session wander tops out ~1.13x — must not
        # false-positive (0.189s was the worst idle sample observed)
        degraded, ratio = bench.ambient_verdict(0.189, 0.167)
        assert not degraded and ratio == 1.132

    def test_boundary_is_exclusive(self):
        at = round(bench.AMBIENT_DEGRADED_RATIO * 0.167, 4)
        degraded, _ = bench.ambient_verdict(at, 0.167)
        assert not degraded

    def test_fails_open_without_reference(self):
        """No pinned reference (first recording / hand-edited pin file)
        -> never degraded: the sentinel must not block the driver's
        recording; the run self-pins instead."""
        for ref in (None, 0, -1.0):
            degraded, ratio = bench.ambient_verdict(5.0, ref)
            assert not degraded and ratio is None

    def test_threshold_sits_between_idle_wander_and_failure_mode(self):
        """The constant's contract: above the measured ~1.13x idle
        wander (no false positives), below the 1.26x failure mode it
        exists to catch (no false negatives on the r10 shape)."""
        assert 1.13 < bench.AMBIENT_DEGRADED_RATIO < 1.26

    def test_calibration_loop_runs_and_is_subsecond(self):
        t = bench.cpu_calibration()
        assert 0 < t < 1.0

    def test_io_channel_gate_is_generous(self):
        """The fsync probe's idle spread is ~1.4x (min-of-4), so its
        gate must sit well above that while still catching gross disk
        contention; the CPU gate stays the tight channel."""
        assert bench.AMBIENT_IO_DEGRADED_RATIO >= 2.0
        ref = 0.185
        # idle-worst sample must not trip
        deg, _ = bench.ambient_verdict(
            0.26, ref, bench.AMBIENT_IO_DEGRADED_RATIO
        )
        assert not deg
        # gross contention does
        deg, ratio = bench.ambient_verdict(
            0.60, ref, bench.AMBIENT_IO_DEGRADED_RATIO
        )
        assert deg and ratio == 3.243

    def test_io_calibration_runs(self):
        t = bench.io_calibration(cycles=20, rounds=2)
        assert 0 < t < 5.0

    def test_io_probe_shares_fs_with_table_workdirs(self, monkeypatch):
        """ADVICE r11 #3: the io probe must measure the filesystem the
        benched table family actually writes to. Both the probe dir and
        the Catalog working dirs (plans/tables.py) derive from
        tempfile.mkdtemp, so they move TOGETHER under a TMPDIR override
        — pin that the probe goes through that API (a REPO-rooted probe
        would silently decouple)."""
        import tempfile

        used = []
        real = tempfile.mkdtemp

        def spying_mkdtemp(*a, **kw):
            d = real(*a, **kw)
            used.append(d)
            return d

        monkeypatch.setattr(tempfile, "mkdtemp", spying_mkdtemp)
        bench.io_calibration(cycles=5, rounds=1)
        assert used, "io_calibration must allocate via tempfile.mkdtemp"
        import os

        assert all(
            os.path.dirname(d.rstrip("/")) == tempfile.gettempdir()
            for d in used
        )


class TestMidsweepSentinel:
    """r12: the endpoint probes are blind to a disk episode that starts
    and ends INSIDE the sweep (observed: 55 retimes + a 2.2x pin flag
    with both endpoint channels clean). The mid-sweep io trace detects
    it; two CONSECUTIVE breaches mark the run degraded — one can be the
    one-round probe's own noise."""

    REF = 0.10

    def test_two_consecutive_breaches_degrade(self):
        assert bench.midsweep_verdict([0.11, 0.26, 0.27, 0.12], self.REF)

    def test_single_spike_is_probe_noise(self):
        assert not bench.midsweep_verdict(
            [0.11, 0.26, 0.12, 0.27, 0.11], self.REF
        )

    def test_clean_trace_is_clean(self):
        assert not bench.midsweep_verdict([0.09, 0.12, 0.15, 0.2], self.REF)

    def test_fails_open_without_reference(self):
        for ref in (None, 0, -1.0):
            assert not bench.midsweep_verdict([9.9, 9.9, 9.9], ref)

    def test_boundary_is_exclusive(self):
        at = bench.AMBIENT_IO_DEGRADED_RATIO * self.REF
        assert not bench.midsweep_verdict([at, at, at], self.REF)

    def test_retime_storm_threshold_sits_above_observed_clean_max(self):
        """Clean recordings show 0-18 re-times (r12 observed max on a
        noisy-but-accepted run: 18; the retired storm run: 55) — the
        threshold must separate the two."""
        assert 18 < bench.RETIME_STORM_THRESHOLD <= 55


class TestRetimeStormCorroboration:
    """ADVICE r12 #1: a retime count past the threshold alone must NOT
    suppress flags — a real regression in shared code (barrier(),
    quantize, session config) can slow >25 queries across families and
    would suppress its own flags as 'box noise'. The storm verdict now
    needs corroboration: an independent ambient-channel breach, or
    family-scattered retimes whose retries did NOT reproduce the
    slowdown. VERDICT r12 ask #6: the threshold itself is derived from
    the recorded clean-sweep retime-count distribution, floor = the
    static constant."""

    @staticmethod
    def _retimed(n, families=8, retry_fast=True):
        out = {}
        for i in range(n):
            fam = f"fam{i % families}"
            out[f"{fam}_q{i}"] = {
                "first": 3.0,
                "retry": 0.9 if retry_fast else 2.8,
                "accepted": True,
                "trigger": "pin",
            }
        return out

    @staticmethod
    def _pins(retimed):
        return {n: 1.0 for n in retimed}

    def test_below_threshold_is_not_even_a_candidate(self):
        retimed = self._retimed(5)
        storm, info = bench.retime_storm_verdict(
            retimed, self._pins(retimed), {}, channel_breach=False
        )
        assert not storm and not info["candidate"]

    def test_channel_breach_corroborates(self):
        retimed = self._retimed(30)
        storm, info = bench.retime_storm_verdict(
            retimed, self._pins(retimed), {}, channel_breach=True
        )
        assert storm and info["corroborated_by"] == "ambient-channel"

    def test_scattered_one_offs_corroborate(self):
        # the r12 disk-episode shape: retimes scattered across many
        # families, every retry back at steady state
        retimed = self._retimed(30, families=10, retry_fast=True)
        storm, info = bench.retime_storm_verdict(
            retimed, self._pins(retimed), {}, channel_breach=False
        )
        assert storm and "scatter" in info["corroborated_by"]

    def test_reproduced_slowdown_keeps_flags(self):
        # the shared-code-regression shape the advice names: >threshold
        # retimes, scattered, but the retries are SLOW TOO — candidate
        # recorded, flags kept (no storm)
        retimed = self._retimed(30, families=10, retry_fast=False)
        storm, info = bench.retime_storm_verdict(
            retimed, self._pins(retimed), {}, channel_breach=False
        )
        assert not storm
        assert info["candidate"]
        assert info["corroborated_by"] is None
        assert info["one_off_fraction"] < bench.RETIME_STORM_ONEOFF_FRACTION

    def test_concentrated_family_keeps_flags(self):
        # one family, even with fast retries: a touched-family
        # regression pattern, not scatter — no suppression without a
        # channel breach
        retimed = self._retimed(30, families=1, retry_fast=True)
        storm, info = bench.retime_storm_verdict(
            retimed, self._pins(retimed), {}, channel_breach=False
        )
        assert not storm and info["candidate"]

    def test_prev_reference_counts_for_reproduction(self):
        # a not-yet-pinned query's reproduction check falls back to the
        # previous recording, mirroring the retime trigger itself
        retimed = self._retimed(30, families=10, retry_fast=False)
        prev = {n: 1.0 for n in retimed}
        storm, info = bench.retime_storm_verdict(
            retimed, {}, prev, channel_breach=False
        )
        assert not storm and info["one_off_fraction"] < 0.5

    def test_derived_threshold_fallback_below_min_samples(self):
        t, n, _c = bench.derived_retime_storm_threshold([0, 1, 2])
        assert t == bench.RETIME_STORM_THRESHOLD and n == 3

    def test_derived_threshold_floors_at_static_from_seed_history(self):
        # the 22 committed clean sweeps through r12: p99*1.3 ~ 12,
        # below the static floor — the derived bar must not TIGHTEN
        seed = [1, 0, 10, 0, 1, 2, 2, 4, 0, 0, 0,
                1, 1, 1, 0, 6, 1, 0, 0, 0, 3, 0]
        t, n, _c = bench.derived_retime_storm_threshold(seed)
        assert t == bench.RETIME_STORM_THRESHOLD and n == 22

    def test_derived_threshold_widens_with_evidence(self):
        t, _, _c = bench.derived_retime_storm_threshold([22] * 10)
        assert bench.RETIME_STORM_THRESHOLD < t <= bench.RETIME_STORM_CEIL

    def test_derived_threshold_ceiling(self):
        t, _, _c = bench.derived_retime_storm_threshold([100] * 10)
        assert t == bench.RETIME_STORM_CEIL

    def test_baseline_file_carries_the_seed_distribution(self):
        """The committed BENCH_BASELINE.json must hold the clean-sweep
        retime counts the derived threshold reads (VERDICT r12 ask #6),
        enough of them to activate the derived path."""
        import json
        import os

        path = os.path.join(os.path.dirname(bench.__file__), "BENCH_BASELINE.json")
        doc = json.load(open(path))
        samples = doc.get("retime_count_samples")
        assert samples and len(samples) >= bench.MIN_RETIME_SAMPLES
        t, _, _c = bench.derived_retime_storm_threshold(samples)
        assert t >= bench.RETIME_STORM_THRESHOLD


class TestDerivedThreshold:
    """VERDICT r11 #4: the CPU gate derived from the recorded rolling
    idle distribution (p99 x margin) instead of the bare static
    constant, with the static value as both the <5-sample fallback and
    the floor — evidence can only WIDEN the gate, never tighten it
    below the proven 1.20 (a lower gate adds no detection value
    against the >=25% failure mode, only false-flag risk)."""

    REF = 0.167

    def test_fallback_below_min_samples(self):
        t, n, _c = bench.derived_cpu_threshold([0.17, 0.18, 0.19], self.REF)
        assert t == bench.AMBIENT_DEGRADED_RATIO and n == 3

    def test_fallback_without_reference(self):
        for ref in (None, 0, -1.0):
            t, n, _c = bench.derived_cpu_threshold([0.17] * 10, ref)
            assert t == bench.AMBIENT_DEGRADED_RATIO and n == 0

    def test_tight_idle_base_floors_at_the_static_gate(self):
        # the r12 seed shape: idle ratios 1.01-1.14 -> p99*1.05 ~ 1.19,
        # below the floor — the derived gate must not tighten past 1.20
        samples = [0.1803, 0.1898, 0.1756, 0.1686, 0.1763,
                   0.1768, 0.1682, 0.1888, 0.1824, 0.1828]
        t, n, _c = bench.derived_cpu_threshold(samples, self.REF)
        assert t == bench.AMBIENT_DEGRADED_RATIO and n == 10

    def test_wide_idle_wander_widens_the_gate(self):
        # a box whose clean sweeps genuinely wander to 1.22x idle: the
        # gate follows the evidence above the static constant
        samples = [0.17, 0.18, 0.19, 0.20, 0.2037, 0.17]
        t, n, _c = bench.derived_cpu_threshold(samples, self.REF)
        assert bench.AMBIENT_DEGRADED_RATIO < t <= bench.DERIVED_THRESHOLD_CEIL
        assert n == 6

    def test_hot_history_is_ceilinged(self):
        # a drifting-hot "idle" base must not blunt the gate past the
        # failure mode the sentinel exists to catch
        samples = [0.30] * 8
        t, _, _c = bench.derived_cpu_threshold(samples, self.REF)
        assert t == bench.DERIVED_THRESHOLD_CEIL

    def test_nonpositive_samples_are_ignored(self):
        t, n, _c = bench.derived_cpu_threshold([0.17, 0, -1.0, None and 0] + [0.18] * 2, self.REF)
        assert n == 3 and t == bench.AMBIENT_DEGRADED_RATIO

    def test_baseline_seed_derives_the_static_gate(self):
        """The committed BENCH_BASELINE.json seed (>=5 recorded idle
        samples) must actually drive the derivation — and today it
        floors at exactly the static gate."""
        import json
        import os

        with open(os.path.join(bench.REPO, "BENCH_BASELINE.json")) as f:
            doc = json.load(f)
        samples = doc.get("calibration_samples") or []
        assert len(samples) >= bench.MIN_IDLE_SAMPLES
        t, n, _c = bench.derived_cpu_threshold(samples, doc["calibration_sec"])
        assert n == len(samples)
        assert bench.AMBIENT_DEGRADED_RATIO <= t <= bench.DERIVED_THRESHOLD_CEIL

    def test_settle_honors_custom_cpu_limit(self):
        """The start probe must gate on the DERIVED limit, not the
        static constant: a 1.25x start sample settles under the static
        gate but is clean under a derived 1.30 gate."""
        sleeps = []
        cpu, io = bench.settled_start_samples(
            0.167,
            0.10,
            cpu_limit=1.30,
            _cpu=lambda: 0.209,  # 1.25x
            _io=lambda: 0.11,
            _sleep=sleeps.append,
        )
        assert cpu == 0.209 and sleeps == []


class TestSettledStartSamples:
    """The start probe's settle-retry: the maiden r11 run showed the
    sentinel catching a just-exited job's residual heat (start 1.31x,
    end 0.94x, sweep pristine) — since the driver runs the drive and
    bench back-to-back, a retry-free start probe would mark every
    driver recording degraded and gate flags would never be recorded."""

    REF_CPU, REF_IO = 0.167, 0.10

    def _run(self, cpu_seq, io_seq):
        sleeps = []
        cpu_it, io_it = iter(cpu_seq), iter(io_seq)
        cpu, io = bench.settled_start_samples(
            self.REF_CPU,
            self.REF_IO,
            _cpu=lambda: next(cpu_it),
            _io=lambda: next(io_it),
            _sleep=sleeps.append,
        )
        return cpu, io, sleeps

    def test_clean_start_samples_once_and_never_sleeps(self):
        cpu, io, sleeps = self._run([0.17], [0.11])
        assert (cpu, io) == (0.17, 0.11) and sleeps == []

    def test_transient_heat_clears_after_one_settle(self):
        # the r11 shape: hot first cpu sample, idle resample
        cpu, io, sleeps = self._run([0.22, 0.16], [0.11, 0.12])
        assert cpu == 0.16 and io == 0.11 and len(sleeps) == 1

    def test_persistent_heat_keeps_breaching_samples(self):
        cpu, io, sleeps = self._run([0.23, 0.22, 0.24], [0.11, 0.12, 0.13])
        assert cpu == 0.22  # min of the hot samples — still > 1.2x ref
        assert len(sleeps) == 2
        assert bench.ambient_verdict(cpu, self.REF_CPU)[0]

    def test_io_breach_alone_triggers_settle(self):
        cpu, io, sleeps = self._run([0.16, 0.17], [0.30, 0.09])
        assert io == 0.09 and len(sleeps) == 1

    def test_min_is_kept_across_resamples(self):
        # a resample can only improve the recorded sample, never worsen
        cpu, io, sleeps = self._run([0.22, 0.25, 0.21], [0.11, 0.2, 0.3])
        assert cpu == 0.21 and io == 0.11


class TestThresholdSourceLabel:
    """ADVICE r13 #3: the audit trail must not call a clamped gate
    evidence-derived — the current retime seed derives ~12, floored at
    the static 25, and used to be labeled 'derived(...)'."""

    def test_floored_retime_seed_reports_static_floor(self):
        seed = [1, 0, 10, 0, 1, 2, 2, 4, 0, 0, 0,
                1, 1, 1, 0, 6, 1, 0, 0, 0, 3, 0]
        t, n, clamp = bench.derived_retime_storm_threshold(seed)
        assert t == bench.RETIME_STORM_THRESHOLD and clamp == "floor"
        label = bench._threshold_source_label(
            n, bench.MIN_RETIME_SAMPLES, clamp, "p99...", t, bench.RETIME_STORM_CEIL
        )
        assert label.startswith(f"static-floor({bench.RETIME_STORM_THRESHOLD})")

    def test_ceilinged_reports_static_ceil(self):
        t, n, clamp = bench.derived_retime_storm_threshold([100] * 10)
        assert clamp == "ceil"
        label = bench._threshold_source_label(
            n, bench.MIN_RETIME_SAMPLES, clamp, "p99...",
            bench.RETIME_STORM_THRESHOLD, bench.RETIME_STORM_CEIL,
        )
        assert label.startswith(f"static-ceil({bench.RETIME_STORM_CEIL})")

    def test_genuinely_derived_reports_derived(self):
        t, n, clamp = bench.derived_retime_storm_threshold([22] * 10)
        assert clamp is None
        label = bench._threshold_source_label(
            n, bench.MIN_RETIME_SAMPLES, clamp, "p99...",
            bench.RETIME_STORM_THRESHOLD, bench.RETIME_STORM_CEIL,
        )
        assert label.startswith("derived(")

    def test_below_min_samples_reports_static(self):
        label = bench._threshold_source_label(
            2, 5, None, "p99...", 25, 60
        )
        assert label == "static(25)"

    def test_cpu_clamp_matches_label_contract(self):
        # the r12 tight-idle seed shape floors at the static CPU gate
        samples = [0.1803, 0.1898, 0.1756, 0.1686, 0.1763,
                   0.1768, 0.1682, 0.1888, 0.1824, 0.1828]
        t, n, clamp = bench.derived_cpu_threshold(samples, 0.167)
        assert t == bench.AMBIENT_DEGRADED_RATIO and clamp == "floor"


class TestSettleGate:
    """VERDICT r13 ask #3: the 300.6 s residual-heat episode (5-min
    start loadavg 7.8, 1-min channels clean) becomes code — a
    pin-eligible sweep refuses to start over the derived 5-min bar,
    settling in bounded steps instead of recording-then-retiring."""

    def test_derived_bar_fallback_below_min_samples(self):
        bar, n, clamp = bench.derived_load5_bar([1.1, 1.4])
        assert bar == bench.LOAD5_STATIC_BAR and n == 2

    def test_seed_derives_above_floor_and_splits_good_from_bad(self):
        # the r14 seed: every committed clean 5-min start passes,
        # every degraded/retired start breaches
        seed = [1.07, 1.35, 1.39, 2.02]
        bar, n, clamp = bench.derived_load5_bar(seed)
        assert bench.LOAD5_STATIC_BAR <= bar <= bench.LOAD5_CEIL
        assert all(s <= bar for s in seed)
        for bad in (3.44, 3.86, 5.3, 7.8):
            assert bad > bar

    def test_bar_floors_at_static(self):
        bar, _, clamp = bench.derived_load5_bar([0.1, 0.2, 0.1, 0.2])
        assert bar == bench.LOAD5_STATIC_BAR and clamp == "floor"

    def test_bar_is_ceilinged(self):
        bar, _, clamp = bench.derived_load5_bar([9.0] * 6)
        assert bar == bench.LOAD5_CEIL and clamp == "ceil"

    def test_baseline_carries_the_seed(self):
        import json
        import os

        with open(os.path.join(bench.REPO, "BENCH_BASELINE.json")) as f:
            doc = json.load(f)
        samples = doc.get("loadavg5_start_samples") or []
        assert len(samples) >= bench.MIN_LOAD5_SAMPLES
        bar, n, _ = bench.derived_load5_bar(samples)
        assert bench.LOAD5_STATIC_BAR <= bar <= bench.LOAD5_CEIL

    def test_clean_start_never_sleeps(self):
        sleeps = []
        breached, audit = bench.settle_gate_wait(
            2.6, _loadavg=lambda: (0.5, 1.2, 2.0), _sleep=sleeps.append
        )
        assert not breached and sleeps == [] and audit["slept_s"] == 0

    def test_transient_heat_settles_and_clears(self):
        readings = iter([(3.0, 4.0, 3.0), (2.0, 3.1, 2.8), (1.0, 1.8, 2.5)])
        sleeps = []
        breached, audit = bench.settle_gate_wait(
            2.6, _loadavg=lambda: next(readings), _sleep=sleeps.append
        )
        assert not breached
        assert len(sleeps) == 2
        assert audit["initial_load5"] == 4.0 and audit["final_load5"] == 1.8

    def test_persistent_heat_breaches_after_budget(self):
        sleeps = []
        breached, audit = bench.settle_gate_wait(
            2.6, _loadavg=lambda: (3.0, 3.5, 3.0), _sleep=sleeps.append
        )
        assert breached and len(sleeps) == bench.SETTLE_RETRIES

    def test_hopeless_heat_skips_the_sleeps(self):
        """A 5-min loadavg that exponential decay cannot bring under
        the bar within the whole budget must not burn 3 minutes of
        driver wall time first."""
        sleeps = []
        breached, audit = bench.settle_gate_wait(
            2.6, _loadavg=lambda: (8.0, 7.8, 6.0), _sleep=sleeps.append
        )
        assert breached and sleeps == []


class TestNormalizedWall:
    """VERDICT r13 ask #6: cross-round wall-clock comparisons start
    from a box-adjusted number."""

    def test_idle_box_passes_through(self):
        v, mean = bench.normalized_wall(300.0, 1.0, 1.0)
        assert v == 300.0 and mean == 1.0

    def test_hot_box_is_deflated(self):
        # the r13 shape: ~10% uniform inflation on both endpoints
        v, mean = bench.normalized_wall(318.0, 1.10, 1.10)
        assert mean == 1.10 and abs(v - 289.09) < 0.01

    def test_single_available_ratio_used_alone(self):
        v, mean = bench.normalized_wall(300.0, None, 1.2)
        assert mean == 1.2 and v == 250.0

    def test_no_reference_passes_raw(self):
        v, mean = bench.normalized_wall(300.0, None, None)
        assert v == 300.0 and mean is None


class TestPinLedger:
    """VERDICT r13 ask #4: the 4-round re-pin governance watch becomes
    an enforced invariant — one auditable machine-readable ledger with
    an evidence bar no future upward re-pin can slip under."""

    VALID_BASES = {
        "changed-implementation-first-recording",
        "history-median",
        "post-warmup-steady",
    }

    @staticmethod
    def _ledger():
        import json
        import os

        with open(os.path.join(bench.REPO, "BENCH_BASELINE.json")) as f:
            doc = json.load(f)
        return doc, doc.get("pin_ledger")

    def test_ledger_exists_and_covers_all_repin_keys(self):
        doc, ledger = self._ledger()
        assert ledger, "pin_ledger missing from BENCH_BASELINE.json"
        queries = {e["query"] for e in ledger}
        # every query named in the legacy repins_r11/r12/r13 records
        # must appear in the consolidated ledger
        for q in ("multimodal_audio_features", "udf_arrow_python_scalar"):
            assert q in queries
        for q in doc["repins_r12"]["repins"]:
            assert q in queries
        for q in ("ts_anomaly_robust_mad", "win_time_range_rolling",
                  "table_vacuum_lifecycle_audit"):
            assert q in queries

    def test_every_entry_is_well_formed(self):
        _, ledger = self._ledger()
        for e in ledger:
            assert e["basis"] in self.VALID_BASES, e
            assert e["direction"] in ("up", "down"), e
            assert e["direction"] == ("up" if e["new"] > e["old"] else "down")
            assert abs(e["gate_widening"] - e["new"] / e["old"]) < 0.01, e
            assert isinstance(e["round"], int) and e["round"] >= 2

    def test_upward_history_median_entries_meet_the_evidence_bar(self):
        """An upward re-pin permanently widens the 2x hard gate: it
        needs >=10 committed clean-sweep samples (or an explicit judge
        sanction recorded for the pre-bar r11 entries). A future entry
        below the bar fails CI here."""
        _, ledger = self._ledger()
        for e in ledger:
            if e["direction"] != "up" or e["basis"] != "history-median":
                continue
            if e["n_history_samples"] < 10:
                assert e.get("sanction"), (
                    f"{e['query']}: upward history-median re-pin with "
                    f"{e['n_history_samples']} samples and no sanction"
                )

    def test_current_pins_match_ledger_heads(self):
        """The latest ledger entry per query must equal the live pin —
        a hand-edited pin without a ledger entry is the drift this
        file exists to kill."""
        doc, ledger = self._ledger()
        latest = {}
        for e in ledger:  # chronological; later entries win
            latest[e["query"]] = e["new"]
        for q, pinned_new in latest.items():
            assert abs(doc["queries"][q] - pinned_new) < 1e-6, (
                f"{q}: pin {doc['queries'][q]} != ledger head {pinned_new}"
            )


class TestWarmup:
    def test_warmup_runs_end_to_end(self, spark):
        """bench.warmup is the recording's single point of failure: an
        exception there exits bench non-zero BEFORE any query is timed
        (observed once — an uninferrable pandas-UDF signature), which
        would cost the round its BENCH recording. Smoke it on the tiny
        fixture with the session the suite already has."""
        bench.warmup(spark, "/root/testdata/sf0.001")
