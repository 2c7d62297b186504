"""scripts/rotate_priority.py — the rotation that keeps the driver's
50-query CORRECTNESS window pointed at never-certified queries.

``--write`` REWRITES ``iceberg_rs_spark/plans/corpus.py`` in place; a
buggy splice would corrupt the corpus for every subsequent round, so
the round-trip is pinned here against a temp copy (no Spark needed).
"""

from __future__ import annotations

import ast
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts.rotate_priority import (  # noqa: E402
    certified_names,
    rotation,
    write_priority,
)


def _priority_literal(source: str) -> list[str]:
    """The PRIORITY list literal of a corpus.py source string
    (AnnAssign: ``PRIORITY: list[str] = [...]``)."""
    for node in ast.walk(ast.parse(source)):
        if (
            isinstance(node, ast.AnnAssign)
            and getattr(node.target, "id", "") == "PRIORITY"
        ):
            return [ast.literal_eval(e) for e in node.value.elts]
    raise AssertionError("PRIORITY assignment missing")


def _load_corpus_module():
    import iceberg_rs_spark.plans  # noqa: F401 — populate the registry
    from iceberg_rs_spark.plans import corpus

    return corpus


class TestRotation:
    def test_rotation_is_a_permutation_of_the_corpus(self):
        corpus = _load_corpus_module()
        rot = rotation([])
        assert sorted(rot) == sorted(corpus.CORPUS)

    def test_backlog_leads_then_derived_recerts(self):
        """Rotation contract (r7): hand RECERT first, then the ENTIRE
        never-certified backlog, then git-derived re-cert candidates
        (certified, but implementation changed since their green row),
        then everything else — so a 50-window always drains the
        highest-value names first."""
        from scripts.rotate_priority import derived_recert

        corpus = _load_corpus_module()
        cert = certified_names()
        rot = rotation([])
        n_recert = len(
            [n for n in getattr(corpus, "RECERT", []) if n in corpus.CORPUS]
        )
        n_backlog = sum(
            1
            for n in corpus.CORPUS
            if n not in cert and corpus.CORPUS[n].oracle is not None
        )
        head = rot[n_recert : n_recert + n_backlog]
        assert all(
            n not in cert and corpus.CORPUS[n].oracle is not None
            for n in head
        )
        derived = {
            n
            for n in derived_recert()
            if n in corpus.CORPUS and n not in set(rot[: n_recert + n_backlog])
        }
        mid = rot[n_recert + n_backlog : n_recert + n_backlog + len(derived)]
        assert set(mid) == derived
        # among the rest, never-certified (rows-only) queries sort
        # ahead of certified ones (ADVICE r6 #1), certified rows-only
        # queries at the very end
        rest = rot[n_recert + n_backlog + len(derived) :]
        flags = [n in cert for n in rest]
        assert flags == sorted(flags)
        cert_rest = [n for n in rest if n in cert]
        oracle_flags = [corpus.CORPUS[n].oracle is None for n in cert_rest]
        assert oracle_flags == sorted(oracle_flags)

    def test_certified_tail_is_age_ordered(self):
        """VERDICT r12 ask #1: once the backlog and re-cert queues are
        empty, the window's value is staleness refresh — the certified
        (oracle-backed) tail must be ordered by the age of each name's
        LAST green driver row, oldest round first, so the driver
        re-certifies the corpus cyclically (~6 rounds per full cycle)."""
        from scripts.rotate_priority import _last_green_rounds, derived_recert

        corpus = _load_corpus_module()
        cert = certified_names()
        greens = _last_green_rounds()
        rot = rotation([])
        skip = set(getattr(corpus, "RECERT", [])) | set(derived_recert())
        cert_tail = [
            n
            for n in rot
            if n in cert
            and n not in skip
            and corpus.CORPUS[n].oracle is not None
        ]
        rounds = [greens[n] for n in cert_tail]
        assert rounds == sorted(rounds), (
            "certified tail not age-ordered (oldest green row must lead)"
        )

    def test_stale_priority_head_fails_ci(self):
        """VERDICT r6 ask #2: a stale PRIORITY head must FAIL CI, not
        print a log line. Whenever the never-certified backlog is
        non-empty, the committed corpus.PRIORITY's first 50 entries
        must contain every backlog name that fits (the mechanical
        rotation puts the whole backlog right after the hand RECERT
        queue) — a head of 50 already-green names while the backlog
        waits means a driver round certifies nothing new (the r5 AND
        r6 repeat miss). Fix: run scripts/rotate_priority.py --write
        and commit."""
        corpus = _load_corpus_module()
        cert = certified_names()
        backlog = [
            n
            for n in corpus.CORPUS
            if n not in cert and corpus.CORPUS[n].oracle is not None
        ]
        if not backlog:
            import pytest

            pytest.skip("backlog empty — nothing a stale head could starve")
        head50 = [n for n in corpus.PRIORITY if n in corpus.CORPUS][:50]
        n_recert = len(
            [n for n in getattr(corpus, "RECERT", []) if n in corpus.CORPUS]
        )
        fits = min(len(backlog), 50 - n_recert)
        missing = [n for n in backlog if n not in head50]
        assert len(backlog) - len(missing) >= fits, (
            f"PRIORITY head is STALE: {missing} never-certified but outside "
            "the 50-query driver window; run scripts/rotate_priority.py "
            "--write and commit"
        )

    def test_head_ignoring_derived_recert_queue_fails_ci(self):
        """VERDICT r7 ask #3: with the never-certified backlog
        permanently at zero, the only way the r5/r6 stale-head miss
        class can recur is a committed PRIORITY head containing ZERO
        git-derived re-cert candidates while the derived queue is
        non-empty — a driver round would then re-certify 50 unchanged
        already-green queries and drain nothing. Such a head must FAIL
        pytest (it was CI-silent before this gate). Mid-round edits
        that add a few NEW derived candidates do not trip it: only a
        head with an EMPTY intersection fails. Fix: run
        scripts/rotate_priority.py --write and commit."""
        import pytest

        from scripts.rotate_priority import derived_recert

        corpus = _load_corpus_module()
        derived = {n for n in derived_recert() if n in corpus.CORPUS}
        if not derived:
            pytest.skip("derived re-cert queue empty at HEAD")
        cert = certified_names()
        hand = [n for n in getattr(corpus, "RECERT", []) if n in corpus.CORPUS]
        backlog = [
            n
            for n in corpus.CORPUS
            if n not in cert and corpus.CORPUS[n].oracle is not None
        ]
        if len(hand) + len(backlog) >= 50:
            pytest.skip("window fully consumed by hand RECERT + backlog")
        head50 = [n for n in corpus.PRIORITY if n in corpus.CORPUS][:50]
        assert derived & set(head50), (
            "PRIORITY head is STALE vs the git-derived re-cert queue: "
            f"{len(derived)} changed-implementation candidates queued but "
            "none inside the 50-query driver window; run "
            "scripts/rotate_priority.py --write and commit. NOTE: this "
            "state is EXPECTED at a between-rounds HEAD whenever the "
            "derived queue outgrew the window — the driver records "
            "CORRECTNESS_r{N}.json after the round's last commit, which "
            "drains the window and can leave the committed head pointing "
            "at just-certified names. Since r10 the ritual rotates TWICE "
            "(--write as the first AND last code commit of each round), "
            "so a queue that fits the 50-window leaves HEAD green; a red "
            "HEAD is a prompt for the next round's first commit, not a "
            "defect in the recorded round."
        )

    def test_recert_queue_auto_leads(self):
        """corpus.RECERT (changed implementations awaiting a fresh
        driver row) must head EVERY mechanical rotation without any
        flag — a rotation that dropped them would ship a changed
        implementation uncertified (the r5 miss class)."""
        corpus = _load_corpus_module()
        recert = [n for n in getattr(corpus, "RECERT", []) if n in corpus.CORPUS]
        if not recert:
            import pytest

            pytest.skip("RECERT queue empty at HEAD")
        rot = rotation([])
        assert rot[: len(recert)] == recert

    def test_lead_pins_the_head_after_recerts(self):
        corpus = _load_corpus_module()
        recert = [n for n in getattr(corpus, "RECERT", []) if n in corpus.CORPUS]
        some = [n for n in list(corpus.CORPUS) if n not in set(recert)][:3]
        rot = rotation(some)
        assert rot[: len(recert)] == recert
        assert rot[len(recert) : len(recert) + 3] == some
        assert sorted(rot) == sorted(corpus.CORPUS)

    def test_unknown_lead_names_are_dropped(self):
        corpus = _load_corpus_module()
        rot = rotation(["not_a_query_xyz"])
        assert "not_a_query_xyz" not in rot
        assert sorted(rot) == sorted(corpus.CORPUS)


class TestCertifiedNames:
    def test_hash_failure_is_not_certified(self, tmp_path):
        """rows_match=true + hash_match=false is a hash FAILURE for an
        oracle-backed query (CORRECTNESS_r01 recorded three) — it must
        stay in the backlog, not count as certified."""
        corpus = _load_corpus_module()
        oracle_q = next(
            n for n in corpus.CORPUS if corpus.CORPUS[n].oracle is not None
        )
        rows_only_q = next(
            n for n in corpus.CORPUS if corpus.CORPUS[n].oracle is None
        )
        rec = tmp_path / "CORRECTNESS_rXX.json"
        rec.write_text(
            __import__("json").dumps(
                {
                    oracle_q: {
                        "rows_match": True,
                        "hash_match": False,
                        "err": None,
                    },
                    rows_only_q: {
                        "rows_match": True,
                        "hash_match": False,
                        "err": None,
                    },
                }
            )
        )
        got = certified_names(paths=[str(rec)])
        assert oracle_q not in got  # hash failure stays in the backlog
        assert rows_only_q in got  # rows-only passes on rows_match

    def test_no_oracle_row_certifies_rows_only_queries_only(self, tmp_path):
        """The driver records a rows-only query's weaker check as
        err='no_oracle' + spark_rows (rows_match stays None) — that row
        IS the declared-rule pass (ADVICE r6 #1: the old rows_match
        rule made rows-only queries permanently uncertifiable). The
        SAME row shape must NOT certify an oracle-backed query: the
        sim_topk_* r02/r03 no_oracle rows predate their oracles."""
        import json

        corpus = _load_corpus_module()
        oracle_q = next(
            n for n in corpus.CORPUS if corpus.CORPUS[n].oracle is not None
        )
        rows_only_q = next(
            n for n in corpus.CORPUS if corpus.CORPUS[n].oracle is None
        )
        row = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": 25,
            "oracle_rows": None,
            "err": "no_oracle",
        }
        rec = tmp_path / "CORRECTNESS_rZZ.json"
        rec.write_text(json.dumps({oracle_q: row, rows_only_q: row}))
        got = certified_names(paths=[str(rec)])
        assert rows_only_q in got
        assert oracle_q not in got

    def test_errored_row_never_certifies(self, tmp_path):
        corpus = _load_corpus_module()
        q = next(iter(corpus.CORPUS))
        rec = tmp_path / "CORRECTNESS_rYY.json"
        rec.write_text(
            __import__("json").dumps(
                {q: {"rows_match": True, "hash_match": True, "err": "boom"}}
            )
        )
        assert q not in certified_names(paths=[str(rec)])

    def test_every_certified_oracle_query_has_a_hash_green_row(self):
        """Invariant over the REAL recordings: any certified name that
        carries an oracle must own at least one hash_match=true driver
        row — rows_match alone (the r01 hash-failure shape) is never
        enough."""
        import glob
        import json

        corpus = _load_corpus_module()
        hash_green = set()
        for p in sorted(glob.glob(str(REPO / "CORRECTNESS_r*.json"))):
            for n, row in json.load(open(p)).items():
                if row.get("hash_match") and row.get("err") is None:
                    hash_green.add(n)
        for n in certified_names():
            if n in corpus.CORPUS and corpus.CORPUS[n].oracle is not None:
                assert n in hash_green, n


class TestWriteRoundTrip:
    def test_write_splices_only_the_priority_block(self, tmp_path):
        corpus = _load_corpus_module()
        src_path = REPO / "iceberg_rs_spark" / "plans" / "corpus.py"
        copy = tmp_path / "corpus_copy.py"
        shutil.copy(src_path, copy)

        rot = rotation([])
        write_priority(rot, path=str(copy))

        before = src_path.read_text()
        after = copy.read_text()
        # everything before the PRIORITY block and after its closing
        # bracket is byte-identical — the splice touches nothing else
        b_start = before.index("PRIORITY: list[str] = [")
        a_start = after.index("PRIORITY: list[str] = [")
        assert before[:b_start] == after[:a_start]
        b_end = before.index("]\n", b_start) + 2
        a_end = after.index("]\n", a_start) + 2
        assert before[b_end:] == after[a_end:]

        # the rewritten file still parses and exposes the exact rotation
        assert _priority_literal(after) == rot

    def test_write_survives_bracket_in_hand_comment(self, tmp_path):
        """Hand edits between rotations are expected; a comment line
        inside the block ending in ']' must not derail the splice
        (the AST locator finds the real closing bracket)."""
        corpus = _load_corpus_module()
        src_path = REPO / "iceberg_rs_spark" / "plans" / "corpus.py"
        text = src_path.read_text()
        marker = "PRIORITY: list[str] = ["
        i = text.index(marker) + len(marker)
        tricky = text[:i] + "\n    # see CORRECTNESS_r05[3]" + text[i:]
        copy = tmp_path / "corpus_tricky.py"
        copy.write_text(tricky)

        rot = rotation([])
        write_priority(rot, path=str(copy))
        after = copy.read_text()
        ast.parse(after)  # still valid python — no mid-block splice
        assert _priority_literal(after) == rot

    def test_write_is_idempotent(self, tmp_path):
        corpus = _load_corpus_module()
        src_path = REPO / "iceberg_rs_spark" / "plans" / "corpus.py"
        copy = tmp_path / "corpus_copy.py"
        shutil.copy(src_path, copy)
        rot = rotation([])
        write_priority(rot, path=str(copy))
        once = copy.read_text()
        write_priority(rot, path=str(copy))
        assert copy.read_text() == once


class TestDerivedRecertFingerprints:
    """The git-derived RECERT sweep (VERDICT r6 ask #7) hinges on the
    statement-level fingerprint: a false NEGATIVE ships a changed
    implementation uncertified (the r5/r6 miss class), a false POSITIVE
    only spends a driver slot. These tests pin the sensitivity matrix
    against a synthetic git repo shaped like the real package."""

    BUILDER = '''\
from iceberg_rs_spark.plans.corpus import query
from iceberg_rs_spark.operators import op as OP
from iceberg_rs_spark.functions.hashing import h60_sql

K_PROBE = 6


def helper(x):
    return x + K_PROBE


@query("q_alpha", oracle=f"SELECT {h60_sql('c')} AS h, {K_PROBE} AS k")
def q_alpha(spark, sf_dir):
    """Alpha docstring."""
    return helper(OP.run(spark))


@query("q_beta", oracle="SELECT 2")
def q_beta(spark, sf_dir):
    """Beta docstring."""
    return 2
'''

    FILES = {
        "iceberg_rs_spark/__init__.py": "",
        "iceberg_rs_spark/plans/__init__.py": "",
        "iceberg_rs_spark/plans/corpus.py": (
            "CORPUS = {}\n"
            "PRIORITY: list[str] = []\n"
            "RECERT: list[str] = []\n"
            "def query(name, oracle=None, tags=()):\n"
            "    def deco(fn):\n"
            "        CORPUS[name] = (fn, oracle)\n"
            "        return fn\n"
            "    return deco\n"
        ),
        "iceberg_rs_spark/plans/mini.py": BUILDER,
        "iceberg_rs_spark/operators/__init__.py": "",
        "iceberg_rs_spark/operators/op.py": (
            "LIMIT = 10\n"
            "def run(spark):\n"
            "    return LIMIT\n"
        ),
        "iceberg_rs_spark/functions/__init__.py": "",
        "iceberg_rs_spark/functions/hashing.py": (
            "def h60_sql(c):\n"
            "    return f'hash({c})'\n"
        ),
    }

    def _repo(self, tmp_path, monkeypatch):
        import subprocess

        import scripts.rotate_priority as rp

        for rel, src in self.FILES.items():
            p = tmp_path / rel
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_text(src)
        env_git = ["git", "-c", "user.email=t@t", "-c", "user.name=t"]
        subprocess.run(["git", "init", "-q"], cwd=tmp_path, check=True)
        subprocess.run(
            [*env_git, "add", "-A"], cwd=tmp_path, check=True
        )
        subprocess.run(
            [*env_git, "commit", "-q", "-m", "base"], cwd=tmp_path, check=True
        )
        commit = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=tmp_path,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.strip()
        monkeypatch.setattr(rp, "REPO", str(tmp_path))
        self._clear_caches()
        return rp, commit

    @staticmethod
    def _clear_caches():
        import scripts.rotate_priority as rp

        rp._mod_to_path.cache_clear()
        rp._tree.cache_clear()
        rp._tree_blobs.cache_clear()
        rp._last_green_rounds.cache_clear()
        rp._derived_recert_cached.cache_clear()

    def _fp_pair(self, rp, commit, name):
        wt, _ = rp._tree(None).fingerprint(
            "iceberg_rs_spark/plans/mini.py", name
        )
        at, _ = rp._tree(commit).fingerprint(
            "iceberg_rs_spark/plans/mini.py", name
        )
        return wt, at

    def _edit(self, tmp_path, rel, old, new):
        p = tmp_path / rel
        p.write_text(p.read_text().replace(old, new))
        self._clear_caches()

    def test_docstring_and_comment_edits_never_flag(
        self, tmp_path, monkeypatch
    ):
        rp, commit = self._repo(tmp_path, monkeypatch)
        self._edit(
            tmp_path,
            "iceberg_rs_spark/plans/mini.py",
            '"""Alpha docstring."""',
            '"""Rewritten docstring. # with a comment-looking tail"""',
        )
        self._edit(
            tmp_path,
            "iceberg_rs_spark/operators/op.py",
            "LIMIT = 10",
            "LIMIT = 10  # new trailing comment",
        )
        wt, at = self._fp_pair(rp, commit, "q_alpha")
        assert wt == at

    def test_sibling_query_edit_does_not_flag(self, tmp_path, monkeypatch):
        rp, commit = self._repo(tmp_path, monkeypatch)
        self._edit(
            tmp_path,
            "iceberg_rs_spark/plans/mini.py",
            "return 2",
            "return 3",
        )
        wt, at = self._fp_pair(rp, commit, "q_alpha")
        assert wt == at
        wt_b, at_b = self._fp_pair(rp, commit, "q_beta")
        assert wt_b != at_b

    def test_shared_constant_and_helper_edits_flag(
        self, tmp_path, monkeypatch
    ):
        rp, commit = self._repo(tmp_path, monkeypatch)
        self._edit(
            tmp_path,
            "iceberg_rs_spark/plans/mini.py",
            "K_PROBE = 6",
            "K_PROBE = 8",
        )
        wt, at = self._fp_pair(rp, commit, "q_alpha")
        assert wt != at  # referenced constant feeds the oracle f-string

    def test_oracle_string_edit_flags(self, tmp_path, monkeypatch):
        rp, commit = self._repo(tmp_path, monkeypatch)
        self._edit(
            tmp_path,
            "iceberg_rs_spark/plans/mini.py",
            'oracle="SELECT 2"',
            'oracle="SELECT 2 AS two"',
        )
        wt, at = self._fp_pair(rp, commit, "q_beta")
        assert wt != at
        wt_a, at_a = self._fp_pair(rp, commit, "q_alpha")
        assert wt_a == at_a

    def test_module_alias_dep_flags_on_any_statement(
        self, tmp_path, monkeypatch
    ):
        # operators.op is imported as a module alias -> whole-file dep
        rp, commit = self._repo(tmp_path, monkeypatch)
        self._edit(
            tmp_path,
            "iceberg_rs_spark/operators/op.py",
            "LIMIT = 10",
            "LIMIT = 11",
        )
        wt, at = self._fp_pair(rp, commit, "q_alpha")
        assert wt != at
        # ...but q_beta never touches operators.op
        wt_b, at_b = self._fp_pair(rp, commit, "q_beta")
        assert wt_b == at_b

    def test_alias_dep_transitive_import_flags(self, tmp_path, monkeypatch):
        """ADVICE r7 #1: a whole-module (alias) dep is hashed as one
        file, so its OWN package imports must be traversed to a fixed
        point — a behavior change two hops behind the alias
        (mini -> `op as OP` -> deep.barrier) previously shipped
        uncertified, exactly the false-negative class the sweep exists
        to kill."""
        import subprocess

        rp, _ = self._repo(tmp_path, monkeypatch)
        (tmp_path / "iceberg_rs_spark/operators/deep.py").write_text(
            "BARRIER = 1\n\ndef barrier():\n    return BARRIER\n"
        )
        (tmp_path / "iceberg_rs_spark/operators/op.py").write_text(
            "from iceberg_rs_spark.operators.deep import barrier\n"
            "LIMIT = 10\n"
            "def run(spark):\n"
            "    return LIMIT + barrier()\n"
        )
        env_git = ["git", "-c", "user.email=t@t", "-c", "user.name=t"]
        subprocess.run([*env_git, "add", "-A"], cwd=tmp_path, check=True)
        subprocess.run(
            [*env_git, "commit", "-q", "-m", "deep"], cwd=tmp_path, check=True
        )
        commit = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=tmp_path, capture_output=True, text=True, check=True,
        ).stdout.strip()
        self._clear_caches()
        # the two-hop module is in q_alpha's touched-file set...
        _, files = rp._tree(None).fingerprint(
            "iceberg_rs_spark/plans/mini.py", "q_alpha"
        )
        assert "iceberg_rs_spark/operators/deep.py" in files
        # ...but a comment-only edit there never flags
        self._edit(
            tmp_path,
            "iceberg_rs_spark/operators/deep.py",
            "BARRIER = 1",
            "BARRIER = 1  # comment only",
        )
        wt, at = self._fp_pair(rp, commit, "q_alpha")
        assert wt == at
        # a behavior edit two hops behind the alias import MUST flag
        self._edit(
            tmp_path,
            "iceberg_rs_spark/operators/deep.py",
            "BARRIER = 1",
            "BARRIER = 2",
        )
        wt, at = self._fp_pair(rp, commit, "q_alpha")
        assert wt != at
        # q_beta never touches operators at all
        wt_b, at_b = self._fp_pair(rp, commit, "q_beta")
        assert wt_b == at_b

    def test_alias_dep_import_cycle_terminates(self, tmp_path, monkeypatch):
        """The whole-module closure is a fixed point over the module
        set — two modules importing each other must terminate, and an
        edit anywhere in the cycle must flag."""
        import subprocess

        rp, _ = self._repo(tmp_path, monkeypatch)
        (tmp_path / "iceberg_rs_spark/operators/deep.py").write_text(
            "import iceberg_rs_spark.operators.op\n"
            "BARRIER = 1\n"
            "def barrier():\n    return BARRIER\n"
        )
        (tmp_path / "iceberg_rs_spark/operators/op.py").write_text(
            "from iceberg_rs_spark.operators.deep import barrier\n"
            "LIMIT = 10\n"
            "def run(spark):\n"
            "    return LIMIT + barrier()\n"
        )
        env_git = ["git", "-c", "user.email=t@t", "-c", "user.name=t"]
        subprocess.run([*env_git, "add", "-A"], cwd=tmp_path, check=True)
        subprocess.run(
            [*env_git, "commit", "-q", "-m", "cycle"], cwd=tmp_path, check=True
        )
        commit = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=tmp_path, capture_output=True, text=True, check=True,
        ).stdout.strip()
        self._clear_caches()
        self._edit(
            tmp_path,
            "iceberg_rs_spark/operators/deep.py",
            "BARRIER = 1",
            "BARRIER = 2",
        )
        wt, at = self._fp_pair(rp, commit, "q_alpha")
        assert wt != at

    def test_name_level_import_tracks_only_the_imported_name(
        self, tmp_path, monkeypatch
    ):
        rp, commit = self._repo(tmp_path, monkeypatch)
        # an UNRELATED function added to hashing.py must not flag
        p = tmp_path / "iceberg_rs_spark/functions/hashing.py"
        p.write_text(p.read_text() + "\ndef other():\n    return 1\n")
        self._clear_caches()
        wt, at = self._fp_pair(rp, commit, "q_alpha")
        assert wt == at
        # but editing the imported h60_sql itself must flag
        self._edit(
            tmp_path,
            "iceberg_rs_spark/functions/hashing.py",
            "return f'hash({c})'",
            "return f'xxhash({c})'",
        )
        wt, at = self._fp_pair(rp, commit, "q_alpha")
        assert wt != at

    def test_priority_rotation_never_flags_via_corpus(
        self, tmp_path, monkeypatch
    ):
        rp, commit = self._repo(tmp_path, monkeypatch)
        self._edit(
            tmp_path,
            "iceberg_rs_spark/plans/corpus.py",
            "PRIORITY: list[str] = []",
            'PRIORITY: list[str] = ["q_beta", "q_alpha"]',
        )
        # corpus.py is reached name-level (query) AND its PRIORITY/
        # RECERT are excluded from the whole-module hash, so a rotation
        # flags nothing
        for q in ("q_alpha", "q_beta"):
            wt, at = self._fp_pair(rp, commit, q)
            assert wt == at, q
        assert rp._tree(None).module_hash(
            "iceberg_rs_spark/plans/corpus.py"
        ) == rp._tree(commit).module_hash("iceberg_rs_spark/plans/corpus.py")

    def test_relative_import_is_tracked(self, tmp_path, monkeypatch):
        """A relative import must resolve against the module's own
        package — escaping the sweep would be a silent false negative."""
        rp, _ = self._repo(tmp_path, monkeypatch)
        import subprocess

        rel_builder = self.BUILDER.replace(
            "from iceberg_rs_spark.plans.corpus import query",
            "from .corpus import query",
        ).replace(
            "from iceberg_rs_spark.operators import op as OP",
            "from ..operators import op as OP",
        )
        (tmp_path / "iceberg_rs_spark/plans/mini.py").write_text(rel_builder)
        env_git = ["git", "-c", "user.email=t@t", "-c", "user.name=t"]
        subprocess.run([*env_git, "add", "-A"], cwd=tmp_path, check=True)
        subprocess.run(
            [*env_git, "commit", "-q", "-m", "rel"], cwd=tmp_path, check=True
        )
        commit = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=tmp_path, capture_output=True, text=True, check=True,
        ).stdout.strip()
        self._clear_caches()
        # the relative-alias dep (..operators.op) must flag like the
        # absolute one does
        self._edit(
            tmp_path,
            "iceberg_rs_spark/operators/op.py",
            "LIMIT = 10",
            "LIMIT = 11",
        )
        wt, at = self._fp_pair(rp, commit, "q_alpha")
        assert wt != at

    def test_star_import_is_a_whole_module_dep(self, tmp_path, monkeypatch):
        rp, _ = self._repo(tmp_path, monkeypatch)
        import subprocess

        star_builder = self.BUILDER.replace(
            "from iceberg_rs_spark.functions.hashing import h60_sql",
            "from iceberg_rs_spark.functions.hashing import *",
        )
        (tmp_path / "iceberg_rs_spark/plans/mini.py").write_text(star_builder)
        env_git = ["git", "-c", "user.email=t@t", "-c", "user.name=t"]
        subprocess.run([*env_git, "add", "-A"], cwd=tmp_path, check=True)
        subprocess.run(
            [*env_git, "commit", "-q", "-m", "star"], cwd=tmp_path, check=True
        )
        commit = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=tmp_path, capture_output=True, text=True, check=True,
        ).stdout.strip()
        self._clear_caches()
        # ANY hashing.py change must now flag (we can't know which
        # names a star import pulls)
        p = tmp_path / "iceberg_rs_spark/functions/hashing.py"
        p.write_text(p.read_text() + "\ndef other():\n    return 1\n")
        self._clear_caches()
        wt, at = self._fp_pair(rp, commit, "q_alpha")
        assert wt != at

    def test_rel_import_base_resolution(self):
        from scripts.rotate_priority import _rel_import_base

        assert _rel_import_base("iceberg_rs_spark/plans/llm.py", 1) == (
            "iceberg_rs_spark.plans"
        )
        assert _rel_import_base("iceberg_rs_spark/plans/llm.py", 2) == (
            "iceberg_rs_spark"
        )
        assert _rel_import_base("iceberg_rs_spark/plans/__init__.py", 1) == (
            "iceberg_rs_spark.plans"
        )
        assert _rel_import_base("iceberg_rs_spark/plans/llm.py", 3) is None
