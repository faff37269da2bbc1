"""Static guard: no hard ``F.broadcast()`` hint may pin an sf-scaling relation.

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


def _iter_sites(tree: ast.AST):
    """Yield (func_node, call_node) for every F.broadcast call."""
    funcs = [
        n
        for n in ast.walk(tree)
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
    ]
    for fn in funcs:
        for node in ast.walk(fn):
            if _is_broadcast_call(node) and node.args:
                yield fn, node


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


def _scan_file(path: Path):
    src = path.read_text()
    src_lines = src.split("\n")
    tree = ast.parse(src)
    violations = []
    for fn, call in _iter_sites(tree):
        arg = call.args[0]
        arg_src = ast.get_source_segment(src, arg) or ""
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
            f"{path.relative_to(PKG.parent)}:{call.lineno} "
            f"F.broadcast({arg_src.splitlines()[0][:60]}...) traces to an "
            f"sf-scaling table with no global agg/limit and no '{MARKER}' marker"
        )
    return violations


def test_no_broadcast_of_scaling_relations():
    violations = []
    for sub in ("plans", "operators", "streaming", "functions", "sources", "sinks"):
        d = PKG / sub
        if not d.is_dir():
            continue
        for path in sorted(d.glob("*.py")):
            violations.extend(_scan_file(path))
    assert not violations, (
        "hard F.broadcast() hints pin sf-scaling relations (OOM at the "
        "100 TB design point — delete the hint or add a reviewed "
        "'# bounded: <cardinality argument>' marker):\n" + "\n".join(violations)
    )
