"""Static guard: no size-cliff join pin may touch an sf-scaling relation.

Covers every spelling of a pin whose strategy cannot degrade gracefully
when the relation outgrows memory: ``F.broadcast(x)``,
``x.hint("broadcast"|"broadcast_hash")`` (the same pin by another name),
``x.hint("shuffle_hash")`` (SHJ's build side cannot spill — proven to die
at 100x, NOTES), ``x.hint("shuffle_replicate_nl")`` and ``crossJoin(x)``
(whole-side replication).  ``.hint("merge")`` is exempt: SMJ spills and
has no size cliff — pinning it costs speed, never memory.

Three rounds of site-by-site review (r5 flagged 8 sites, r6 fixed those 8,
r7 found 17 more in ``plans/tpch.py`` + 2 in ``plans/insights.py``) showed
that enumerated site lists don't stick — the *class* needs a regression
guard.  This test walks every ``F.broadcast(...)`` call in ``pkg/plans/``
and ``pkg/operators/`` with ``ast``, traces the broadcast argument through
same-function assignments, and fails when the traced evidence touches one
of the sf-scaling base tables (customer / part / supplier / orders /
lineitem / documents / embeddings / events — all verified to grow linearly
across ``/root/testdata/sf{0.001,0.01,0.1}``) unless the site is bounded
by construction or carries an explicit justification.

A site passes if ANY of:

1. its evidence never references an sf-scaling table (pure nation/region/
   constant relations — those are bounded at every sf);
2. the broadcast argument's own top-level expression ends in a GLOBAL
   aggregate (``.agg(`` with no ``groupBy`` in the same expression) or a
   ``.limit(`` — a 1-row / k-row relation by construction;
3. the broadcast line, the line above it, or any traced assignment line
   carries a ``# bounded:`` marker stating WHY the cardinality does not
   grow with the corpus (e.g. "25 event types", "k centroids", "per-fold
   coefficients").  The marker is a reviewed claim, not an escape hatch:
   adding one without a cardinality argument should fail code review.

Why hints matter: a hard ``F.broadcast()`` overrides
``autoBroadcastJoinThreshold``, so AQE can never flip the join to
sort-merge when the relation is large — at the 100 TB design point a
pinned supplier/part broadcast OOMs every executor, whereas an unhinted
join broadcasts at bench scale and degrades gracefully at cluster scale.
"""

from __future__ import annotations

import ast
import re
from pathlib import Path

PKG = Path(__file__).resolve().parents[1] / "data_engineering_individual_assignment_spark"

SCALING_TABLES = (
    "customer",
    "part",
    "supplier",
    "orders",
    "lineitem",
    "documents",
    "embeddings",
    "events",
)
_SCALING_RE = re.compile(r'["\'](%s)["\']' % "|".join(SCALING_TABLES))
_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
MARKER = "# bounded:"


def _is_broadcast_call(node: ast.AST) -> bool:
    if not isinstance(node, ast.Call):
        return False
    f = node.func
    if isinstance(f, ast.Attribute) and f.attr == "broadcast":
        return isinstance(f.value, ast.Name) and f.value.id in ("F", "functions")
    return isinstance(f, ast.Name) and f.id == "broadcast"


# Join-strategy hints with a size cliff.  "merge" (SMJ) is deliberately
# NOT here: sort-merge spills and has no cliff, pinning it costs speed
# but never correctness/OOM.  shuffle_hash's build side CANNOT spill
# (proven to die at 100x in NOTES); a "broadcast" hint is F.broadcast by
# another spelling; shuffle_replicate_nl replicates a whole side.
_CLIFF_HINTS = ("broadcast", "broadcast_hash", "shuffle_hash", "shuffle_replicate_nl")


def _cliff_arg(node: ast.AST):
    """Return the AST node whose relation a size-cliff operation pins,
    or None if ``node`` is not such an operation.

    - ``F.broadcast(x)``      -> x
    - ``x.hint("shuffle_hash"|"broadcast"|...)`` -> x (the receiver)
    - ``x.crossJoin(y)``      -> y (the replicated/buffered side)
    """
    if not isinstance(node, ast.Call):
        return None
    if _is_broadcast_call(node) and node.args:
        return node.args[0]
    f = node.func
    if isinstance(f, ast.Attribute) and f.attr == "hint" and node.args:
        first = node.args[0]
        if (
            isinstance(first, ast.Constant)
            and isinstance(first.value, str)
            and first.value.lower() in _CLIFF_HINTS
        ):
            return f.value
    if isinstance(f, ast.Attribute) and f.attr == "crossJoin" and node.args:
        inner = node.args[0]
        # crossJoin(F.broadcast(x)) is judged on x — the inner broadcast
        # call is scanned as its own site anyway
        if _is_broadcast_call(inner) and inner.args:
            return inner.args[0]
        return inner
    return None


def _iter_sites(tree: ast.AST):
    """Yield (func_node, call_node, pinned_arg_node) for every size-cliff
    site: F.broadcast calls, cliff .hint() calls, and crossJoin calls."""
    funcs = [
        n
        for n in ast.walk(tree)
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
    ]
    for fn in funcs:
        for node in ast.walk(fn):
            arg = _cliff_arg(node)
            if arg is not None:
                yield fn, node, arg


def _assignments(fn: ast.AST, src: str):
    """name -> list of (lineno, RHS source) for single-target assigns in fn."""
    out: dict[str, list[tuple[int, str]]] = {}
    for node in ast.walk(fn):
        if isinstance(node, ast.Assign) and len(node.targets) == 1:
            tgt = node.targets[0]
            if isinstance(tgt, ast.Name):
                seg = ast.get_source_segment(src, node.value) or ""
                out.setdefault(tgt.id, []).append((node.lineno, seg))
    return out


def _trace(arg_src: str, assigns, depth: int = 6):
    """Expand identifiers through same-function assignments.

    Returns (evidence_text, assignment_linenos)."""
    seen: set[str] = set()
    lines: list[int] = []
    texts = [arg_src]
    frontier = set(_IDENT_RE.findall(arg_src))
    for _ in range(depth):
        nxt: set[str] = set()
        for name in frontier:
            if name in seen or name not in assigns:
                continue
            seen.add(name)
            for lineno, rhs in assigns[name]:
                texts.append(rhs)
                lines.append(lineno)
                nxt |= set(_IDENT_RE.findall(rhs))
        frontier = nxt - seen
        if not frontier:
            break
    return "\n".join(texts), lines


def _globally_aggregated(expr: str) -> bool:
    """True when the expression itself collapses to a bounded relation:
    a global .agg( with no groupBy upstream in the SAME expression, or an
    explicit .limit(."""
    if ".limit(" in expr:
        return True
    return ".agg(" in expr and "groupBy(" not in expr and "groupby(" not in expr


def _stmt_ranges(fn: ast.AST):
    """(start, end) line ranges of every statement in fn."""
    out = []
    for node in ast.walk(fn):
        if isinstance(node, ast.stmt):
            out.append((node.lineno, node.end_lineno or node.lineno))
    return out


def _has_marker(src_lines: list[str], linenos: list[int], ranges) -> bool:
    """Marker counts if it appears anywhere inside the statement containing
    the line (inline comments in a chained expression) or in the contiguous
    comment block immediately above that statement."""
    spans = set()
    for ln in linenos:
        containing = [(s, e) for s, e in ranges if s <= ln <= e]
        if containing:
            # innermost statement = smallest span
            s, e = min(containing, key=lambda r: r[1] - r[0])
            spans.add((s, e))
        else:
            spans.add((ln, ln))
    for s, e in spans:
        for i in range(s - 1, min(e, len(src_lines))):
            if MARKER in src_lines[i]:
                return True
        j = s - 1  # contiguous comment block above the statement
        while j >= 1 and src_lines[j - 1].strip().startswith("#"):
            if MARKER in src_lines[j - 1]:
                return True
            j -= 1
    return False


def _scan_source(src: str, label: str):
    src_lines = src.split("\n")
    tree = ast.parse(src)
    violations = []
    for fn, call, arg in _iter_sites(tree):
        arg_src = ast.get_source_segment(src, arg) or ""
        call_src = (ast.get_source_segment(src, call) or arg_src).splitlines()[0]
        assigns = _assignments(fn, src)
        evidence, assign_lines = _trace(arg_src, assigns)
        ranges = _stmt_ranges(fn)
        if not _SCALING_RE.search(evidence):
            continue  # derived only from bounded relations (nation/region/...)
        # The argument's own expression, plus the *direct* (depth-1) RHS of
        # a bare-name argument, may prove boundedness by construction.
        direct = [arg_src]
        if isinstance(arg, ast.Name) and arg.id in assigns:
            direct += [rhs for _, rhs in assigns[arg.id]]
        if any(_globally_aggregated(d) for d in direct):
            continue
        if _has_marker(src_lines, [call.lineno] + assign_lines, ranges):
            continue
        violations.append(
            f"{label}:{call.lineno} {call_src[:80]}... pins an sf-scaling "
            f"relation with no global agg/limit and no '{MARKER}' marker"
        )
    return violations


def _scan_file(path: Path):
    return _scan_source(path.read_text(), str(path.relative_to(PKG.parent)))


def test_no_broadcast_of_scaling_relations():
    violations = []
    for sub in ("plans", "operators", "streaming", "functions", "sources", "sinks"):
        d = PKG / sub
        if not d.is_dir():
            continue
        for path in sorted(d.glob("*.py")):
            violations.extend(_scan_file(path))
    assert not violations, (
        "size-cliff join pins (F.broadcast / .hint('shuffle_hash'|'broadcast') "
        "/ crossJoin) on sf-scaling relations (OOM at the 100 TB design point "
        "— delete the pin or add a reviewed "
        "'# bounded: <cardinality argument>' marker):\n" + "\n".join(violations)
    )


# --- planted-violation self-tests: the guard must actually FIRE -----------
_PLANT_TMPL = '''
def q(spark, sf_dir):
    big = load_table(spark, sf_dir, "lineitem")
    dim = load_table(spark, sf_dir, "part")
    return big.join({pin}, "p_partkey")
'''


def test_guard_catches_planted_broadcast():
    assert _scan_source(_PLANT_TMPL.format(pin="F.broadcast(dim)"), "planted")


def test_guard_catches_planted_shuffle_hash_hint():
    assert _scan_source(_PLANT_TMPL.format(pin='dim.hint("shuffle_hash")'), "planted")


def test_guard_catches_planted_broadcast_hint():
    assert _scan_source(_PLANT_TMPL.format(pin='dim.hint("broadcast")'), "planted")


def test_guard_catches_planted_crossjoin():
    plant = '''
def q(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.crossJoin(docs.select("doc_id"))
'''
    assert _scan_source(plant, "planted")


def test_guard_allows_merge_hint_and_bounded_sites():
    ok = '''
def q(spark, sf_dir):
    big = load_table(spark, sf_dir, "lineitem")
    tiny = big.agg(F.sum("l_quantity").alias("s"))
    # bounded: 25 nations by TPC-H spec
    marked = load_table(spark, sf_dir, "customer").limit(25)
    return (
        big.hint("merge")
        .join(F.broadcast(tiny))
        .join(F.broadcast(marked), "c_custkey")
        .crossJoin(F.broadcast(tiny))
    )
'''
    assert not _scan_source(ok, "planted")
