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

    def test_backlog_leads_and_rows_only_trail(self):
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
        n_no_oracle = sum(
            1 for n in corpus.CORPUS if corpus.CORPUS[n].oracle is None
        )
        tail = rot[-n_no_oracle:]
        # every certified no-oracle query sorts to the very end
        assert all(
            corpus.CORPUS[n].oracle is None for n in tail if n in cert
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
