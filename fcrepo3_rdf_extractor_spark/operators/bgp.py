"""Basic-graph-pattern (BGP) queries over the constructed triples table.

The reference is construction-only — it has no query language
(`SURVEY.md §2`: "no query language, no optimizer"); downstream, Fedora's
Resource Index is queried with SPARQL-style triple patterns. This module
gives the ENGINE that surface: the conjunctive core of SPARQL (a basic
graph pattern = a set of triple patterns sharing variables) compiled to
a DataFrame plan over the (subj, pred, obj_value) table the pipeline
materializes.

Compilation model — each triple pattern is a FILTERED SCAN of the
triples table (constants become equality predicates that push down to
the parquet/Iceberg scan; variables become projected columns named by
the variable), and shared variables between patterns become hash
EQUI-JOINS. That is the classical relational encoding of SPARQL BGPs
(Cyganiak, "A relational algebra for SPARQL", HPL-2005-170) — and it is
exactly the shape Catalyst optimizes well:

- A star pattern (many patterns sharing the subject variable — the
  dominant KG query shape) compiles to a join chain keyed on ``subj``
  throughout: the first join's exchange partitions by subject and every
  later join reuses that partitioning, so n patterns cost one shuffle
  per side, not n reshuffles. On the ``materialize_graph`` output the
  table is ALREADY subject-bucketed, so star joins are co-located scans.
- Join ORDER follows bound-term count (patterns with more constants
  first — the textbook selectivity heuristic; a fully-bound
  (s, p, ?o) pattern yields a handful of rows, a (?s, ?p, ?o) pattern
  yields the corpus). Ties prefer bound predicates, the highest-skew
  position. After the static ordering, AQE's runtime statistics convert
  small joined sides to broadcasts — the operator does not hand-place
  broadcast hints because pattern selectivity is a data property the
  static compiler cannot know.
- Disconnected patterns (no shared variable with the joined prefix)
  are a cartesian product and REJECTED by default: on a 10^12-triple
  store that is always a bug, not a query.

Callers passing a plan whose lineage contains the extraction UDF should
persist/materialize the narrow triple projection first (self-join sides
do not share exchanges on Spark 4.1 — each pattern would re-run the
parse); the registered queries model reading the materialized graph
table by persisting once.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POS_COLS = ("subj", "pred", "obj_value")


def _is_var(term: str) -> bool:
    return term.startswith("?")


def bgp_query(
    triples: DataFrame,
    patterns: Sequence[tuple[str, str, str]],
    select: Sequence[str] | None = None,
    distinct: bool = False,
    allow_cartesian: bool = False,
    optional_patterns: Sequence[Sequence[tuple[str, str, str]]] | None = None,
    filters: Sequence[tuple[str, str, object]] | None = None,
) -> DataFrame:
    """Evaluate a SPARQL-style basic graph pattern.

    ``patterns``: (subject, predicate, object) triples where a term
    starting with ``?`` is a variable and anything else is a constant
    matched against the corresponding column (objects match
    ``obj_value`` — URI or literal lexical form). A variable repeated
    WITHIN one pattern becomes an equality predicate on that scan.

    ``select``: variables (with or without the ``?``) to project, in
    order; defaults to every variable in first-mention order (required
    patterns first, then optional groups). SPARQL bag semantics by
    default; ``distinct=True`` for set semantics.

    ``filters``: SPARQL FILTER constraints as (variable, op, value)
    tuples, op in {'=', '!=', '<', '<=', '>', '>=', 'contains',
    'regex'}. Declared once over the joined bindings and applied AFTER
    the joins — Catalyst then pushes each predicate down through the
    join tree into the single pattern scan that binds the variable
    (pinned in tests), so declaring late costs nothing and keeps the
    surface declarative. Ordering ops with a NUMERIC ``value`` compare
    on ``try_cast('double')`` of the binding (SPARQL numeric-FILTER
    semantics: non-numeric bindings drop as type errors, never an ANSI
    cast abort); with a string value they compare lexicographically —
    pass an int/float when you mean numbers. Filters on
    required-pattern variables only
    (filtering an OPTIONAL binding would silently change its left-join
    semantics — SPARQL evaluates those filters inside the group).

    ``optional_patterns``: a list of OPTIONAL groups, each itself a
    list of patterns. Each group is compiled as its own BGP and
    LEFT-joined to the required part on their shared variables (the
    SPARQL OPTIONAL left-outer semantics); variables bound only inside
    a group come back NULL where the group found no match. A group
    sharing no variable with the required part is rejected — that is a
    cartesian, not an optional.

    Returns one column per selected variable. Raises ``ValueError`` on
    unknown select variables, constant-only patterns, or (unless
    ``allow_cartesian``) patterns disconnected from the rest of the
    query.
    """
    if not patterns:
        raise ValueError("empty basic graph pattern")

    def vars_of(pat: tuple[str, str, str]) -> list[str]:
        return [t for t in pat if _is_var(t)]

    def bound_count(pat: tuple[str, str, str]) -> int:
        return sum(0 if _is_var(t) else 1 for t in pat)

    all_vars: list[str] = []
    for pat in patterns:
        if len(pat) != 3:
            raise ValueError(f"pattern must be a 3-tuple: {pat!r}")
        if not vars_of(pat):
            raise ValueError(
                f"constant-only pattern {pat!r}: an existence test, not a "
                "bindings producer — filter the triples table directly"
            )
        for v in vars_of(pat):
            if v not in all_vars:
                all_vars.append(v)

    opt_groups = [list(g) for g in (optional_patterns or [])]
    opt_vars: list[str] = []
    for group in opt_groups:
        if not group:
            raise ValueError("empty OPTIONAL group")
        for pat in group:
            for v in vars_of(pat):
                if v not in all_vars and v not in opt_vars:
                    opt_vars.append(v)

    if select is None:
        sel = [v.lstrip("?") for v in all_vars + opt_vars]
    else:
        sel = [s.lstrip("?") for s in select]
        known = {v.lstrip("?") for v in all_vars + opt_vars}
        unknown = [s for s in sel if s not in known]
        if unknown:
            raise ValueError(f"select variables not in any pattern: {unknown}")

    def scan(pat: tuple[str, str, str]) -> DataFrame:
        """One pattern -> filtered, variable-named projection. A
        constant predicate starting with ``^`` is SPARQL's inverse
        path: the pattern matches with subject and object swapped
        (``?coll ^member ?doc`` ≡ ``?doc member ?coll``) — compiled by
        swapping the pattern's terms, zero plan cost. A
        constant predicate ending in ``+`` is SPARQL's one-or-more
        property path: the pattern's bindings are the transitive
        closure of that predicate's edge set (shortest-hop closure via
        :func:`..graph.transitive_closure` — semi-naive delta-frontier
        iteration, the one recursive construct a fixed join chain can't
        express). Subject/object constants on a path pattern filter the
        closure exactly like an ordinary scan."""
        if not _is_var(pat[1]) and pat[1].startswith("^"):
            pat = (pat[2], pat[1][1:], pat[0])
        if not _is_var(pat[1]) and pat[1].endswith("+"):
            from .graph import transitive_closure

            # alternation inside the path: "p|q+" = one-or-more steps,
            # each over EITHER predicate (SPARQL (p|q)+) — the edge set
            # is the union, i.e. an isin filter on the same scan
            preds = pat[1][:-1].split("|")
            edges = triples.filter(F.col("pred").isin(preds)).select(
                F.col("subj"), F.col("obj_value")
            )
            closure = transitive_closure(edges, "subj", "obj_value").drop(
                "depth"
            )
            df, proj, seen_path = closure, [], set()
            for term, col in zip((pat[0], pat[2]), ("subj", "obj_value")):
                if _is_var(term):
                    name = term.lstrip("?")
                    if name in seen_path:  # (?x, p+, ?x): cycle membership
                        df = df.filter(F.col("subj") == F.col("obj_value"))
                    else:
                        seen_path.add(name)
                        proj.append(F.col(col).alias(name))
                else:
                    df = df.filter(F.col(col) == term)
            return df.select(*proj)
        df = triples
        seen: dict[str, str] = {}  # var name -> first column bound to it
        proj = []
        for term, col in zip(pat, _POS_COLS):
            if _is_var(term):
                name = term.lstrip("?")
                if name in seen:
                    # repeated variable within the pattern: equality
                    df = df.filter(F.col(seen[name]) == F.col(col))
                else:
                    seen[name] = col
                    proj.append(F.col(col).alias(name))
            else:
                df = df.filter(F.col(col) == term)
        return df.select(*proj)

    # selectivity order: most bound terms first; ties prefer a bound
    # predicate (the highest-skew position); stable on input order
    order = sorted(
        range(len(patterns)),
        key=lambda i: (-bound_count(patterns[i]), _is_var(patterns[i][1]), i),
    )
    remaining = list(order)
    first = remaining.pop(0)
    joined = scan(patterns[first])
    joined_vars = {v.lstrip("?") for v in vars_of(patterns[first])}

    while remaining:
        # greedy: next-most-selective pattern CONNECTED to the prefix
        pick = next(
            (
                j
                for j in remaining
                if joined_vars & {v.lstrip("?") for v in vars_of(patterns[j])}
            ),
            None,
        )
        if pick is None:
            if not allow_cartesian:
                raise ValueError(
                    "disconnected basic graph pattern (cartesian product); "
                    "pass allow_cartesian=True only if you mean it"
                )
            pick = remaining[0]
        remaining.remove(pick)
        pat_vars = {v.lstrip("?") for v in vars_of(patterns[pick])}
        on = sorted(joined_vars & pat_vars)
        nxt = scan(patterns[pick])
        joined = joined.join(nxt, on=on, how="inner") if on else joined.crossJoin(nxt)
        joined_vars |= pat_vars

    _OPS = {
        "=": lambda c, v: c == v,
        "!=": lambda c, v: c != v,
        "<": lambda c, v: c < v,
        "<=": lambda c, v: c <= v,
        ">": lambda c, v: c > v,
        ">=": lambda c, v: c >= v,
        "contains": lambda c, v: c.contains(v),
        "regex": lambda c, v: c.rlike(v),
    }
    _ORDERING = {"<", "<=", ">", ">="}
    for var, op, value in filters or []:
        name = var.lstrip("?")
        if name not in joined_vars:
            raise ValueError(
                f"FILTER on {var!r}: not bound by any required pattern"
            )
        if op not in _OPS:
            raise ValueError(f"unknown FILTER op {op!r}")
        col = F.col(name)
        if op in _ORDERING and isinstance(value, (int, float)) and not isinstance(
            value, bool
        ):
            # SPARQL numeric FILTER: bindings are string lexical forms,
            # so compare on try_cast(double) — a non-numeric binding
            # becomes NULL and is filtered out (SPARQL type-error
            # semantics), instead of an ANSI CAST abort (a plain cast
            # would kill the job on the first non-numeric row) or a
            # silently-lexicographic string compare ('10' < '5').
            col = col.try_cast("double")
            value = float(value)
        joined = joined.filter(_OPS[op](col, value))

    for group in opt_groups:
        sub = bgp_query(
            triples,
            group,
            allow_cartesian=allow_cartesian,
        )
        on = sorted(joined_vars & set(sub.columns))
        if not on:
            raise ValueError(
                "OPTIONAL group shares no variable with the required "
                "patterns — that is a cartesian, not an optional"
            )
        joined = joined.join(sub, on=on, how="left")
        joined_vars |= set(sub.columns)

    out = joined.select(*sel)
    return out.distinct() if distinct else out


def bgp_union(
    triples: DataFrame,
    branches: Sequence[Sequence[tuple[str, str, str]]],
    select: Sequence[str],
    distinct: bool = False,
    allow_cartesian: bool = False,
) -> DataFrame:
    """SPARQL UNION: evaluate each branch as its own BGP and concatenate
    the binding sets. ``select`` is required (it defines the shared
    output shape); a branch that does not bind one of the selected
    variables contributes NULL there — SPARQL's unbound semantics.
    Bag semantics by default (UNION ALL); ``distinct=True`` dedups.

    Plan shape: a plain Union of the branch plans — each branch keeps
    its own pushed-down scans and join ordering, and Spark unions
    partitions without a shuffle (the filter+union double-evaluation
    gotcha does not apply when the triples input is a table scan; for a
    UDF-backed plan, persist it first, same as bgp_query)."""
    if not branches:
        raise ValueError("empty UNION")
    sel = [s.lstrip("?") for s in select]
    outs = []
    for patterns in branches:
        sub = bgp_query(
            triples, patterns, allow_cartesian=allow_cartesian
        )
        cols = [
            F.col(v).cast("string").alias(v)
            if v in sub.columns
            else F.lit(None).cast("string").alias(v)
            for v in sel
        ]
        outs.append(sub.select(*cols))
    out = outs[0]
    for nxt in outs[1:]:
        out = out.unionByName(nxt)
    return out.distinct() if distinct else out
