"""Object-store-semantics CommitBackend fake (VERDICT r11 #2).

The `CommitBackend` contract (iceberg_rs_spark/sources/icelake.py:376)
was proven *satisfiable* by a fake that mimics POSIX link; this fake
certifies the contract is *sufficient* for the failure surface an
S3/REST catalog actually has:

- **No link primitive.** `claim_version` reads the fully-staged tmp
  object (the "staged upload") and performs a conditional PUT on the
  version object — `If-None-Match: *` CAS: the PUT fails iff the key
  already exists. A real deployment swaps the catalog's
  current-metadata-location pointer in a transaction; the observable
  semantics to the commit protocol are identical.
- **Atomic visibility.** An object PUT is all-or-nothing: readers see
  either no object or the complete body, never a prefix. Modeled by
  writing a staging file and `os.replace`-ing it into place. The
  staging name contains ``.tmp.`` so a crash mid-PUT leaves litter the
  orphan sweep collects and version resolution ignores.
- **Deterministic injected races** (the three the verdict named):

  * ``lose_every=N`` — every Nth claim loses the CAS to a RACER that
    lands a *real* competing commit first (the previous version's
    document plus a ``chaos-racer`` property, a valid property-only
    commit), then raises FileExistsError. The loser's `_commit` retry
    must re-read, re-apply its updater ON TOP of the racer's commit,
    and land at the next version — so the randomized lifecycle
    differential's dict oracle still matches after every commit.
  * ``sweep_every=M`` — every Mth claim finds its staged upload swept
    by a concurrent orphan sweep (tmp unlinked, FileNotFoundError);
    `_write_metadata_version` must rewrite and retry the claim without
    burning a conflict retry.
  * Stale LIST-after-PUT is reader-side, not claim-side, so it is
    injected by the tests themselves (see
    TestObjectStoreBackend.test_stale_list_after_successful_claim_converges)
    by hiding the newest version object from `os.path.exists` /
    `os.listdir` for a bounded number of probes.

Counters (`calls`, `conflicts_injected`, `sweeps_injected`,
`puts_committed`) let tests assert the chaos actually fired — a seed
change must not hollow the sweep silently.
"""

from __future__ import annotations

import json
import os
import re

from iceberg_rs_spark.sources.icelake import CommitBackend, _fsync_dir

_VERSION_RE = re.compile(r"^(?P<stem>.*[/\\])v(?P<n>\d+)\.metadata\.json$")


class ObjectStoreFakeBackend(CommitBackend):
    """Conditional-PUT CAS claim with deterministic injected races."""

    def __init__(self, lose_every: int = 0, sweep_every: int = 0):
        self.lose_every = lose_every
        self.sweep_every = sweep_every
        self.calls = 0
        self.conflicts_injected = 0
        self.sweeps_injected = 0
        self.puts_committed = 0
        self._seq = 0
        # test hook: raised between staging write and the atomic
        # visibility swap to model a writer dying mid-PUT
        self.die_before_swap_once = False
        # one-shot variants of the periodic chaos, for targeted tests
        self.lose_next = False
        self.sweep_next = False

    # -- race injection -------------------------------------------------

    def _racer_commit(self, path: str) -> bool:
        """A concurrent writer wins the CAS for `path` with a REAL
        property-only commit: the previous version's complete document
        plus a nonce property. Returns False (skip injection) when
        there is no previous version to base the racer's commit on
        (the v1 create) — a racer there would be a create-table race,
        covered separately."""
        m = _VERSION_RE.match(path)
        assert m, path
        n = int(m.group("n"))
        prev = f"{m.group('stem')}v{n - 1}.metadata.json"
        if n < 2 or not os.path.exists(prev):
            return False
        with open(prev) as f:
            doc = json.load(f)
        doc.setdefault("properties", {})["chaos-racer"] = str(self.calls)
        self._atomic_put(path, json.dumps(doc).encode())
        return True

    # -- the claim ------------------------------------------------------

    def _atomic_put(self, path: str, body: bytes) -> None:
        """All-or-nothing object visibility: full write + fsync to a
        staging key, then one atomic rename. `.tmp.` in the staging
        name keeps crash litter invisible to version resolution and
        sweepable by remove_orphan_files."""
        self._seq += 1
        staging = f"{path}.tmp.put.{os.getpid()}.{self._seq}"
        with open(staging, "wb") as f:
            f.write(body)
            f.flush()
            os.fsync(f.fileno())
        if self.die_before_swap_once:
            self.die_before_swap_once = False
            raise OSError("simulated writer death mid-PUT")
        os.replace(staging, path)
        _fsync_dir(os.path.dirname(path))

    def claim_version(self, tmp: str, path: str) -> None:
        self.calls += 1
        if self.sweep_next or (
            self.sweep_every and self.calls % self.sweep_every == 0
        ):
            self.sweep_next = False
            self.sweeps_injected += 1
            os.unlink(tmp)  # the concurrent orphan sweep collects it
            raise FileNotFoundError(tmp)
        if (
            self.lose_next
            or (self.lose_every and self.calls % self.lose_every == 0)
        ) and not os.path.exists(path):
            self.lose_next = False
            if self._racer_commit(path):
                self.conflicts_injected += 1
                raise FileExistsError(path)
        # staged upload must still exist (contract: FileNotFoundError
        # iff the tmp vanished)
        with open(tmp, "rb") as f:
            body = f.read()
        # conditional PUT — If-None-Match: * — exactly one claimant wins
        if os.path.exists(path):
            raise FileExistsError(path)
        self._atomic_put(path, body)
        self.puts_committed += 1
