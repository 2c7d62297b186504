"""scripts/scale_probe.py — the replica-builder cache keying.

The probe materializes 5x/10x replicas under /tmp and caches them
behind a _READY marker; round 9's ADVICE flagged that the marker was
not keyed by source, so re-pointing SPARK_GRAFT_SF_DIR silently
reused replicas built from a DIFFERENT fixture. Pinned here with two
tiny fixtures and no Spark (duckdb only).
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts import scale_probe  # noqa: E402


def _doc_count(path: Path) -> int:
    return duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{path}/documents.parquet')"
    ).fetchone()[0]


def _lineitem_count(path: Path) -> int:
    # lineitem is copied verbatim by build_scaled, and its row count
    # differs across scale factors (documents is 500 rows at every sf)
    return duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{path}/lineitem.parquet')"
    ).fetchone()[0]


@pytest.fixture()
def src_counts():
    a, b = Path("/root/testdata/sf0.001"), Path("/root/testdata/sf0.01")
    return (a, _lineitem_count(a)), (b, _lineitem_count(b))


def test_ready_marker_is_keyed_by_source(tmp_path, monkeypatch, src_counts):
    (src_a, n_a), (src_b, n_b) = src_counts
    assert n_a != n_b, "fixtures must differ for the test to mean anything"
    dst = tmp_path / "sfX"

    monkeypatch.setattr(scale_probe, "SRC", src_a)
    scale_probe.build_scaled(replicas=2, dst=dst)
    assert (dst / "_READY").read_text() == str(src_a.resolve())
    assert _lineitem_count(dst) == n_a
    assert _doc_count(dst) == 2 * _doc_count(src_a)

    # same source again: cache hit, nothing rebuilt
    marker_mtime = (dst / "_READY").stat().st_mtime_ns
    scale_probe.build_scaled(replicas=2, dst=dst)
    assert (dst / "_READY").stat().st_mtime_ns == marker_mtime

    # different source: the pre-fix behavior silently reused src_a's
    # replicas; now the directory must be wiped and rebuilt from src_b
    monkeypatch.setattr(scale_probe, "SRC", src_b)
    scale_probe.build_scaled(replicas=2, dst=dst)
    assert (dst / "_READY").read_text() == str(src_b.resolve())
    assert _lineitem_count(dst) == n_b


def test_legacy_empty_marker_forces_rebuild(tmp_path, monkeypatch, src_counts):
    """Markers written by the pre-fix `touch()` are empty; they must
    read as a key mismatch (rebuild), not a cache hit."""
    (src_a, n_a), _ = src_counts
    dst = tmp_path / "sfY"
    dst.mkdir()
    (dst / "_READY").touch()
    monkeypatch.setattr(scale_probe, "SRC", src_a)
    scale_probe.build_scaled(replicas=2, dst=dst)
    assert (dst / "_READY").read_text() == str(src_a.resolve())
    assert _lineitem_count(dst) == n_a
    assert _doc_count(dst) == 2 * _doc_count(src_a)
