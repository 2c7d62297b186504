"""PRIORITY-rotation helper (run after EVERY CORRECTNESS recording).

The driver certifies only the first 50 `queries()` entries per round,
so `iceberg_rs_spark/plans/corpus.py:PRIORITY` must lead with queries
that (a) have no green driver CORRECTNESS row yet, or (b) changed
implementation since their last green row. This script computes the
remaining backlog after each round:

    python scripts/rotate_priority.py            # report only
    python scripts/rotate_priority.py --write    # rewrite corpus.PRIORITY

Report mode prints, in current PRIORITY order:
- the never-certified backlog (what the next 50-window should lead
  with), grouped by family;
- any certified name still sitting inside the first 50 (wasted window
  slots, unless deliberately kept for re-verification of a change).

``--write`` regenerates the PRIORITY block mechanically: hash-
certifiable backlog first (family-grouped, stable order), then
certified names in their previous relative order, then the no-oracle
rows-only queries last. Changed-implementation re-certs lead the head
automatically via ``corpus.RECERT`` (record the change THERE, next to
the code that changed — not as a flag someone must remember); ``--lead
name1,name2`` pins additional names ahead of everything for one-off
judgment calls. The r5 miss (recorded a round, forgot to rotate) is
the failure mode --write exists to kill: the bench-record commit
ritual is  record CORRECTNESS → update RECERT → rotate --write →
commit (VERDICT r5 asks #1-#2).
"""

from __future__ import annotations

import argparse
import ast
import copy
import glob
import hashlib
import json
import subprocess
import sys
from collections import Counter
from functools import lru_cache
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

PKG = "iceberg_rs_spark"

#: rotation order between families (VERDICT r5 #1); unknown families
#: sort after, alphabetically.
FAMILY_ORDER = [
    "fn", "win", "sim", "text", "pipeline", "graph", "join",
    "table", "sub", "dedup", "ingest", "ts",
]


def _row_passes(spec, row: dict) -> bool:
    """Whether one driver CORRECTNESS row certifies its query under the
    CURRENT registry.

    Oracle-backed query: needs a clean (err=None) row with BOTH
    rows_match and hash_match — rows_match alone is a hash FAILURE
    (r01 recorded three), and an old ``err='no_oracle'`` row predating
    the oracle (sim_topk_* r02/r03) never counts.

    Rows-only query (oracle=None by the declared determinism rules):
    the driver records its weaker check as ``err='no_oracle'`` with the
    spark row count and rows_match=None — that recorded run IS the
    declared-rule pass (ADVICE r6 #1: the old rows_match-only rule made
    these queries permanently uncertifiable, so their backlog never
    drained)."""
    needs_hash = spec is not None and spec.oracle is not None
    if needs_hash:
        return (
            row.get("err") is None
            and bool(row.get("rows_match"))
            and bool(row.get("hash_match"))
        )
    if row.get("err") == "no_oracle":
        return row.get("spark_rows") is not None
    return row.get("err") is None and bool(row.get("rows_match"))


def certified_names(paths: "list[str] | None" = None) -> set[str]:
    """Names with a PASSING driver CORRECTNESS row in any round (see
    :func:`_row_passes` for the per-shape pass rule)."""
    import iceberg_rs_spark.plans  # noqa: F401 — populate the registry
    from iceberg_rs_spark.plans import corpus

    if paths is None:
        paths = sorted(glob.glob(f"{REPO}/CORRECTNESS_r*.json"))
    out: set[str] = set()
    for path in paths:
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if _row_passes(corpus.CORPUS.get(name), row):
                out.add(name)
    return out


# ---------------------------------------------------------------------------
# Derived RECERT (VERDICT r6 ask #7): certification state must not be
# hand-maintained. A query is a re-cert candidate when the code its
# result depends on changed AFTER its last green driver row. The
# dependency set is derived mechanically: statement-level AST reachability
# from the @query builder (decorator + oracle f-string included) inside
# its defining module, recursing across iceberg_rs_spark modules —
# name-level for ``from m import names``, whole-file for module-alias
# imports (``from pkg import module as M``) CLOSED over the aliased
# module's own package imports (fixed point — ADVICE r7 #1: a change
# two hops behind an alias import must flag). Fingerprints normalize via
# ast.dump with docstrings stripped, so comment/docstring-only edits and
# PRIORITY rotations never flag, while an oracle-string or constant
# change always does. False positives cost one wasted driver slot;
# false negatives recreate the r5/r6 stale-certification miss class, so
# ties break toward flagging.
# ---------------------------------------------------------------------------


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout


def _strip_docstrings(node: ast.AST) -> ast.AST:
    for n in ast.walk(node):
        if isinstance(n, (ast.Module, ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            body = n.body
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                body[0].value.value = ""
    return node


def _norm(node: ast.AST) -> str:
    """Comment- and docstring-insensitive normal form of a statement."""
    return ast.dump(_strip_docstrings(copy.deepcopy(node)))


def _defined_names(st: ast.stmt) -> set[str]:
    if isinstance(st, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        return {st.name}
    if isinstance(st, ast.Assign):
        return {
            n.id
            for t in st.targets
            for n in ast.walk(t)
            if isinstance(n, ast.Name)
        }
    if isinstance(st, ast.AnnAssign) and isinstance(st.target, ast.Name):
        return {st.target.id}
    if isinstance(st, ast.Import):
        return {(a.asname or a.name.split(".")[0]) for a in st.names}
    if isinstance(st, ast.ImportFrom):
        return {(a.asname or a.name) for a in st.names}
    return set()


def _query_decl(st: ast.stmt) -> "str | None":
    """The corpus name a top-level ``@query("name", ...)`` function
    registers, else None."""
    if not isinstance(st, (ast.FunctionDef, ast.AsyncFunctionDef)):
        return None
    for d in st.decorator_list:
        if isinstance(d, ast.Call):
            f = d.func
            fname = (
                f.id
                if isinstance(f, ast.Name)
                else (f.attr if isinstance(f, ast.Attribute) else None)
            )
            if fname == "query" and d.args and isinstance(d.args[0], ast.Constant):
                return d.args[0].value
    return None


def _is_docstring_stmt(st: ast.stmt) -> bool:
    return (
        isinstance(st, ast.Expr)
        and isinstance(st.value, ast.Constant)
        and isinstance(st.value.value, str)
    )


@lru_cache(maxsize=None)
def _mod_to_path(mod: str) -> "str | None":
    rel = mod.replace(".", "/")
    for cand in (f"{rel}.py", f"{rel}/__init__.py"):
        if (Path(REPO) / cand).exists():
            return cand
    return None


def _rel_import_base(path: str, level: int) -> "str | None":
    """The absolute module a relative import resolves against: for
    module file a/b/c.py (or package file a/b/__init__.py), level 1 is
    package a.b; each extra level pops one more."""
    parts = path[:-3].split("/")
    parts = parts[:-1]  # module -> its package; __init__ -> its dir
    drop = level - 1
    if drop >= len(parts):
        return None
    return ".".join(parts[: len(parts) - drop])


class _ModuleIndex:
    """Top-level-statement index of one module source: which statement
    defines which name, which statements are @query builders, which run
    unconditionally at import (wildcards — included in every
    fingerprint), and which package modules each import touches."""

    def __init__(self, src: str, path: "str | None" = None):
        tree = ast.parse(src)
        self.path = path
        self.stmts: list[ast.stmt] = tree.body
        self.defs: dict[str, list[int]] = {}
        self.wild: list[int] = []
        self.queries: dict[str, int] = {}
        for i, st in enumerate(self.stmts):
            q = _query_decl(st)
            if q is not None:
                self.queries[q] = i
            names = _defined_names(st)
            star = isinstance(st, ast.ImportFrom) and any(
                a.name == "*" for a in st.names
            )
            if star:
                # a star import defines names we cannot enumerate — no
                # ref can ever pull it, so include it unconditionally
                self.wild.append(i)
            elif names:
                for nm in names:
                    self.defs.setdefault(nm, []).append(i)
            elif not _is_docstring_stmt(st):
                self.wild.append(i)

    @staticmethod
    def refs(st: ast.stmt) -> set[str]:
        return {n.id for n in ast.walk(st) if isinstance(n, ast.Name)}

    def pkg_imports(self, st: ast.stmt) -> "list[tuple[str, str | None]]":
        """(dep module path, imported name or None-for-whole-module)
        pairs for every iceberg_rs_spark import anywhere in ``st``.
        Relative imports resolve against this module's own package; a
        star import is a whole-module dependency — both would otherwise
        escape the sweep silently (a false negative ships a changed
        implementation uncertified)."""
        out: list[tuple[str, str | None]] = []
        for n in ast.walk(st):
            if isinstance(n, ast.Import):
                for a in n.names:
                    if a.name.startswith(PKG):
                        p = _mod_to_path(a.name)
                        if p:
                            out.append((p, None))
            elif isinstance(n, ast.ImportFrom):
                if n.level and self.path:
                    root = _rel_import_base(self.path, n.level)
                    mod = (
                        f"{root}.{n.module}" if root and n.module else root
                    )
                elif n.level:
                    mod = None  # relative import, module path unknown
                else:
                    mod = n.module
                if not (mod and mod.startswith(PKG)):
                    continue
                base = _mod_to_path(mod)
                for a in n.names:
                    if a.name == "*":
                        if base:
                            out.append((base, None))
                        continue
                    sub = _mod_to_path(f"{mod}.{a.name}")
                    if sub:
                        out.append((sub, None))  # module alias import
                    elif base:
                        out.append((base, a.name))
        return out


class _Tree:
    """One side of the comparison: the working tree (commit=None) or a
    recorded commit's tree. Sources and indexes are cached per side."""

    def __init__(self, commit: "str | None"):
        self.commit = commit
        self._src: dict[str, "str | None"] = {}
        self._idx: dict[str, "_ModuleIndex | None"] = {}
        self._mod_hash: dict[str, str] = {}

    def src(self, path: str) -> "str | None":
        if path not in self._src:
            if self.commit is None:
                p = Path(REPO) / path
                self._src[path] = p.read_text() if p.exists() else None
            else:
                try:
                    self._src[path] = _git("show", f"{self.commit}:{path}")
                except subprocess.CalledProcessError:
                    self._src[path] = None
        return self._src[path]

    def idx(self, path: str) -> "_ModuleIndex | None":
        if path not in self._idx:
            src = self.src(path)
            self._idx[path] = (
                _ModuleIndex(src, path) if src is not None else None
            )
        return self._idx[path]

    def blobs(self) -> dict[str, str]:
        if self.commit is None:
            out = {}
            for p in Path(REPO, PKG).rglob("*.py"):
                data = p.read_bytes()
                out[str(p.relative_to(REPO))] = hashlib.sha1(
                    b"blob %d\x00" % len(data) + data
                ).hexdigest()
            return out
        out = {}
        for line in _git("ls-tree", "-r", self.commit, "--", PKG).splitlines():
            meta, path = line.split("\t", 1)
            out[path] = meta.split()[2]
        return out

    def module_hash(self, path: str) -> str:
        """Whole-module normalized hash (module-alias deps). corpus.py's
        PRIORITY/RECERT blocks are certification metadata BY DESIGN —
        excluded so rotations and queue edits never flag anything."""
        if path in self._mod_hash:
            return self._mod_hash[path]
        src = self.src(path)
        if src is None:
            self._mod_hash[path] = "<absent>"
            return "<absent>"
        tree = ast.parse(src)
        if path.endswith("plans/corpus.py"):
            tree.body = [
                st
                for st in tree.body
                if not (_defined_names(st) & {"PRIORITY", "RECERT"})
            ]
        out = hashlib.sha256(_norm(tree).encode()).hexdigest()
        self._mod_hash[path] = out
        return out

    def fingerprint(self, entry_path: str, qname: str) -> "tuple[str, set[str]]":
        """(fingerprint, touched file set) of one query's transitive
        implementation on this side. Statement worklist: start at the
        builder + the entry module's wildcards; follow name refs to
        defining statements; recurse into package imports (name-level
        where explicit, whole-module for aliases)."""
        parts: list[str] = []
        files: set[str] = set()
        whole: set[str] = set()
        seen: set[tuple[str, int]] = set()
        wild_done: set[str] = set()
        work: list[tuple[str, int]] = []

        def add_whole(path: str) -> None:
            """Whole-module dep, closed over ITS package imports (ADVICE
            r7 #1): a module pulled in by alias/star import is hashed as
            one file, so its own `from pkg import m`/`import pkg.m`
            edges would otherwise never be traversed and a behavior
            change two hops away (e.g. round4e -> `similarity as S` ->
            dedup.barrier) would ship uncertified. Fixed point over the
            module set; every reached module is also hashed whole (a
            name-level import inside a whole-module dep still executes
            that target module at import time)."""
            stack = [path]
            while stack:
                p = stack.pop()
                if p in whole:
                    continue
                whole.add(p)
                files.add(p)
                ixw = self.idx(p)
                if ixw is None:
                    continue
                for st in ixw.stmts:
                    for dep_path, _dep_name in ixw.pkg_imports(st):
                        stack.append(dep_path)

        def enter_module(path: str) -> "_ModuleIndex | None":
            ix = self.idx(path)
            files.add(path)
            if ix is None:
                parts.append(f"{path}:<absent>")
                return None
            if path not in wild_done:
                wild_done.add(path)
                for i in ix.wild:
                    if (path, i) not in seen:
                        seen.add((path, i))
                        work.append((path, i))
            return ix

        entry_ix = enter_module(entry_path)
        if entry_ix is None or qname not in entry_ix.queries:
            parts.append(f"{entry_path}:<no-builder:{qname}>")
        else:
            i = entry_ix.queries[qname]
            seen.add((entry_path, i))
            work.append((entry_path, i))

        while work:
            path, i = work.pop()
            ix = self.idx(path)
            st = ix.stmts[i]
            parts.append(f"{path}:{_norm(st)}")
            for nm in _ModuleIndex.refs(st):
                for j in ix.defs.get(nm, []):
                    if (path, j) not in seen:
                        seen.add((path, j))
                        work.append((path, j))
            for dep_path, dep_name in ix.pkg_imports(st):
                if dep_name is None:
                    add_whole(dep_path)
                    continue
                dep_ix = enter_module(dep_path)
                if dep_ix is None:
                    continue
                for j in dep_ix.defs.get(dep_name, []):
                    if (dep_path, j) not in seen:
                        seen.add((dep_path, j))
                        work.append((dep_path, j))

        for path in sorted(whole):
            parts.append(f"{path}:WHOLE:{self.module_hash(path)}")
        digest = hashlib.sha256("\n".join(sorted(parts)).encode()).hexdigest()
        return digest, files


@lru_cache(maxsize=None)
def _tree(commit: "str | None") -> _Tree:
    return _Tree(commit)


@lru_cache(maxsize=None)
def _tree_blobs(commit: "str | None") -> "dict[str, str]":
    return _tree(commit).blobs()


@lru_cache(maxsize=1)
def _last_green_rounds() -> dict[str, str]:
    """certified name -> path of the LATEST CORRECTNESS file holding a
    passing row (same pass rule as certified_names)."""
    import iceberg_rs_spark.plans  # noqa: F401
    from iceberg_rs_spark.plans import corpus

    out: dict[str, str] = {}
    for path in sorted(glob.glob(f"{REPO}/CORRECTNESS_r*.json")):
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if _row_passes(corpus.CORPUS.get(name), row):
                out[name] = path
    return out


@lru_cache(maxsize=1)
def _derived_recert_cached() -> "tuple[tuple[str, tuple[str, ...]], ...]":
    return tuple(
        (n, tuple(files)) for n, files in _derived_recert_impl().items()
    )


def derived_recert() -> "dict[str, list[str]]":
    """Cached wrapper over :func:`_derived_recert_impl` — the sweep is
    pure in (worktree, recorded commits), both fixed per process."""
    return {n: list(files) for n, files in _derived_recert_cached()}


def _derived_recert_impl() -> "dict[str, list[str]]":
    """Certified names whose transitive implementation changed since
    their last green driver row: name -> changed files (the blob-level
    diff within the query's touched set; the flag itself is the
    normalized statement-level fingerprint mismatch)."""
    import iceberg_rs_spark.plans  # noqa: F401
    from iceberg_rs_spark.plans import corpus

    last_green = _last_green_rounds()
    rec_commit: dict[str, str] = {}
    for path in set(last_green.values()):
        rel = str(Path(path).relative_to(REPO))
        # An untracked/uncommitted recording (the driver writes the file
        # AFTER the builder's last commit) was recorded against HEAD —
        # an empty git-log answer must not break the sweep in exactly
        # the round it matters most.
        rec_commit[path] = (
            _git("log", "-1", "--format=%H", "--", rel).strip() or "HEAD"
        )

    wt = _tree(None)
    wt_blobs = _tree_blobs(None)
    out: dict[str, list[str]] = {}
    for name, rec_path in sorted(last_green.items()):
        spec = corpus.CORPUS.get(name)
        if spec is None:
            continue
        entry_path = _mod_to_path(spec.builder.__module__)
        if entry_path is None:
            continue
        commit = rec_commit[rec_path]
        fp_wt, files = wt.fingerprint(entry_path, name)
        c_blobs = _tree_blobs(commit)
        dirty = sorted(
            f for f in files if c_blobs.get(f) != wt_blobs.get(f)
        )
        if not dirty:
            continue  # every touched file byte-identical since the row
        fp_c, _ = _tree(commit).fingerprint(entry_path, name)
        if fp_c != fp_wt:
            out[name] = dirty
    return out


def rotation(lead: "list[str] | None" = None) -> list[str]:
    """The full PRIORITY list a mechanical rotation would produce:

    1. ``corpus.RECERT`` (the hand judgment-call queue) + ``--lead`` —
       always first; a rotation that dropped a hand-queued re-cert
       would recreate the r5 miss class silently.
    2. The never-certified backlog (no driver row at ALL — strictly
       the most valuable use of a window slot), family-grouped.
    3. :func:`derived_recert`'s git-history candidates (a green row
       exists but their transitive implementation changed since),
       oldest last-green row first — they fill whatever window space
       the backlog leaves and drain over subsequent rounds.
    4. Everything else: never-certified rows-only queries first
       (ADVICE r6 #1 — so they can eventually receive their weaker
       driver check), then certified names ordered by the AGE of
       their last green driver row — oldest round first (VERDICT r12
       ask #1: with the backlog and re-cert queues both empty, the
       window's marginal value is staleness refresh, so the driver
       re-certifies the corpus cyclically, ~6 rounds per full cycle).
       Certified terminal rows-only names keep their place at the very
       end (they can never receive a hash upgrade).
    """
    from iceberg_rs_spark.plans import corpus

    hand = [n for n in getattr(corpus, "RECERT", []) if n in corpus.CORPUS]
    lead = hand + [
        n for n in (lead or []) if n not in set(hand) and n in corpus.CORPUS
    ]
    certified = certified_names()
    names = list(corpus.CORPUS)
    fam_rank = {f: i for i, f in enumerate(FAMILY_ORDER)}

    def fam_key(n: str):
        f = n.split("_")[0]
        return (fam_rank.get(f, len(FAMILY_ORDER)), f)

    cur_order = {n: i for i, n in enumerate(corpus.PRIORITY)}
    backlog = [
        n for n in names
        if n not in certified and corpus.CORPUS[n].oracle is not None
    ]
    backlog.sort(key=lambda n: (fam_key(n), cur_order.get(n, 10**6)))
    try:
        derived = derived_recert()
        greens = _last_green_rounds()
    except Exception as exc:  # no git / shallow clone: fall back loudly
        print(f"WARNING derived_recert unavailable ({exc!r}); "
              "using hand RECERT only", file=sys.stderr)
        derived, greens = {}, {}
    taken = set(lead) | set(backlog)
    derived_q = sorted(
        (n for n in derived if n in corpus.CORPUS and n not in taken),
        key=lambda n: (greens.get(n, ""), n),
    )
    taken |= set(derived_q)
    rest = [n for n in names if n not in taken]
    rest.sort(
        key=lambda n: (
            n in certified,
            corpus.CORPUS[n].oracle is None,
            # oldest last-green row first (cyclic staleness refresh);
            # within one round keep the prior relative order so family
            # grouping survives the rotation
            greens.get(n, "") if n in certified else "",
            cur_order.get(n, 10**6),
        )
    )
    return (
        lead
        + [n for n in backlog if n not in set(lead)]
        + derived_q
        + rest
    )


def write_priority(names: list[str], path: "str | None" = None) -> None:
    path = path or f"{REPO}/iceberg_rs_spark/plans/corpus.py"
    src = open(path).read()
    # Locate the PRIORITY literal by AST, not by string search: hand
    # edits between rotations are expected, and a comment ending in
    # "]" would derail a first-"]\n" scan and splice mid-block.
    node = next(
        n
        for n in ast.walk(ast.parse(src))
        if isinstance(n, ast.AnnAssign)
        and getattr(n.target, "id", "") == "PRIORITY"
    )
    lines_src = src.splitlines(keepends=True)
    start = sum(len(l) for l in lines_src[: node.lineno - 1])
    end = sum(len(l) for l in lines_src[: node.end_lineno])
    lines = ["PRIORITY: list[str] = ["]
    lines.append("    # Mechanically rotated by scripts/rotate_priority.py --write:")
    lines.append("    # hand RECERT + --lead first, then the never-driver-certified")
    lines.append("    # backlog family-grouped, then git-derived re-cert candidates")
    lines.append("    # (implementation changed since their last green row; oldest")
    lines.append("    # row first), then everything else — certified names ordered")
    lines.append("    # oldest-last-green-row first so the driver window cyclically")
    lines.append("    # refreshes stale certifications (VERDICT r12 ask #1).")
    for n in names:
        lines.append(f'    "{n}",')
    lines.append("]")
    open(path, "w").write(src[:start] + "\n".join(lines) + "\n" + src[end:])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true",
                    help="rewrite corpus.PRIORITY with the mechanical rotation")
    ap.add_argument("--lead", default="",
                    help="comma-separated names to pin at the very head "
                         "(changed implementations needing re-certification)")
    args = ap.parse_args()

    import iceberg_rs_spark.plans  # noqa: F401 — populate the registry
    from iceberg_rs_spark.plans import corpus

    certified = certified_names()
    names = list(corpus.CORPUS)
    backlog = [n for n in names if n not in certified]
    head50 = [n for n in corpus.PRIORITY if n in corpus.CORPUS][:50]
    stale = [n for n in head50 if n in certified]

    print(f"corpus={len(names)} certified={len(certified)} backlog={len(backlog)}")
    print("backlog by family:", dict(Counter(n.split('_')[0] for n in backlog)))
    hand = [n for n in getattr(corpus, "RECERT", []) if n in corpus.CORPUS]
    try:
        derived = derived_recert()
        greens = _last_green_rounds()
    except Exception as exc:
        print(f"WARNING derived_recert unavailable ({exc!r})", file=sys.stderr)
        derived, greens = {}, {}
    def _terminal(n: str) -> str:
        # VERDICT r7 ask #5: the declared-rule ceiling is machine-readable
        # — a terminal rows-only query can only ever receive the weaker
        # rows-only driver check, never a hash upgrade.
        spec = corpus.CORPUS.get(n)
        if spec is not None and "terminal-rows-only" in spec.tags:
            return "  [TERMINAL rows-only by declared rule]"
        return ""

    if hand or derived:
        print(f"\nrecert queue (hand={len(hand)} git-derived={len(derived)};"
              " hand leads, derived fills the window after the backlog):")
        for n in hand:
            tag = "; git: " + ", ".join(derived[n]) if n in derived else ""
            print(f"  {n}  [hand{tag}]{_terminal(n)}")
        for n in sorted(derived, key=lambda n: (greens.get(n, ""), n)):
            if n not in hand:
                rnd = Path(greens.get(n, "?")).name
                print(f"  {n}  [git since {rnd}: "
                      f"{', '.join(derived[n])}]{_terminal(n)}")
    stale_hand = [n for n in hand if n not in derived]
    if stale_hand:
        print(
            "hand RECERT entries with no git-derived change since their last\n"
            "green row (re-certified already, or the change predates the row\n"
            "— verify and remove):", stale_hand,
        )
    print("\n-- never-certified backlog (current PRIORITY order) --")
    order = {n: i for i, n in enumerate(corpus.PRIORITY)}
    for n in sorted(backlog, key=lambda n: order.get(n, 10**6)):
        tag = "" if corpus.CORPUS[n].oracle else "  [rows-only: no oracle]"
        print(f"  {n}{tag}{_terminal(n)}")
    if stale:
        print("\n-- certified names inside the 50-window (rotate out unless "
              "kept for re-verification of a change) --")
        for n in stale:
            print(f"  {n}")

    if args.write:
        lead = [s.strip() for s in args.lead.split(",") if s.strip()]
        unknown = [n for n in lead if n not in corpus.CORPUS]
        if unknown:
            # A silently-dropped --lead name recreates the r5 miss
            # class (a changed implementation shipping uncertified).
            sys.exit(f"--lead names not in the corpus: {unknown}")
        rotated = rotation(lead)
        assert sorted(rotated) == sorted(names)
        write_priority(rotated)
        n_new = sum(1 for n in rotated[:50] if n not in certified)
        print(f"\nwrote corpus.PRIORITY: {len(rotated)} names, "
              f"{n_new} never-certified in the 50-window")


if __name__ == "__main__":
    main()
