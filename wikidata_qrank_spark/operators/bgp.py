"""SPARQL-style basic graph pattern (BGP) matching over the triple
relation — the core evaluation step of a SPARQL engine (the reference
serves its KG as flat rankings; this is the query surface a
KG-construction user points a pattern language at), expressed as pure
DataFrame joins so Catalyst owns the join order.

A pattern is a (s, p, o) triple of terms; a term starting with '?' is
a variable, anything else a constant. Each pattern compiles to one
scan of the triple relation with its constants pushed as filters and
its variables projected under the variable names; patterns then join
on their SHARED variables (natural equi-joins — hash-partitioned on
the binding key, never cartesian: every pattern after the first must
share ≥ 1 variable with the accumulated bindings, enforced). Repeated
variables inside one pattern become equality filters (e.g.
('?x', p, '?x') keeps self-loops only).

Scale: each pattern is one filtered, projected pass over the triple
table (constant pushdown reaches the scan), each join is keyed on
binding columns; the plan is left-deep in the given pattern order —
callers order selective patterns first, exactly like hand-written SQL.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_COLS = ("subj", "pred", "obj")


def _compile_pattern(
    triples_df: DataFrame, pat: tuple[str, str, str]
) -> tuple[DataFrame, list[str]]:
    """One pattern → (filtered projection under variable names,
    variables in position order). Constants become pushed filters;
    a repeated variable becomes an equality filter."""
    if len(pat) != 3:
        raise ValueError(f"pattern must have 3 terms, got {pat!r}")
    rel = triples_df.select(*_COLS)
    proj: dict[str, str] = {}
    for col, term in zip(_COLS, pat):
        if term.startswith("?"):
            var = term[1:]
            if not var:
                raise ValueError(f"empty variable name in {pat!r}")
            if var in proj:
                # repeated variable inside one pattern -> equality
                rel = rel.filter(F.col(col) == F.col(proj[var]))
            else:
                proj[var] = col
        else:
            rel = rel.filter(F.col(col) == F.lit(term))
    return rel.select(*[F.col(c).alias(v) for v, c in proj.items()]), list(proj)


def bgp_match(
    triples_df: DataFrame,
    patterns: Sequence[tuple[str, str, str]],
    optional: Sequence[tuple[str, str, str]] = (),
    distinct: bool = True,
) -> DataFrame:
    """Bindings DataFrame with one column per variable, in first-use
    order, for the conjunction of ``patterns`` over (subj, pred, obj),
    then each ``optional`` pattern LEFT-joined in order (SPARQL
    OPTIONAL: its new variables stay NULL where the pattern has no
    match, required bindings are never dropped)."""
    if not patterns:
        raise ValueError("patterns must be non-empty")
    acc: DataFrame | None = None
    bound: list[str] = []
    for pat in patterns:
        rel, pvars = _compile_pattern(triples_df, pat)
        if acc is None:
            acc, bound = rel, pvars
            continue
        shared = [v for v in pvars if v in bound]
        if not shared:
            raise ValueError(
                f"pattern {pat!r} shares no variable with earlier "
                f"patterns {bound} — reorder to avoid a cartesian product"
            )
        acc = acc.join(rel, shared)
        bound += [v for v in pvars if v not in bound]
    required = list(bound)
    for pat in optional:
        rel, pvars = _compile_pattern(triples_df, pat)
        shared = [v for v in pvars if v in bound]
        if not shared:
            raise ValueError(
                f"optional pattern {pat!r} shares no variable with the "
                f"required bindings {bound}"
            )
        # well-designed restriction (Pérez et al.): an OPTIONAL may
        # only consume REQUIRED variables. A variable bound by an
        # earlier OPTIONAL can be NULL, and a plain left join on a
        # NULL key never matches — whereas SPARQL's LeftJoin treats
        # unbound as compatible-with-anything. Rejecting the pattern
        # is honest; silently computing the wrong algebra is not.
        outside = [v for v in shared if v not in required]
        if outside:
            raise ValueError(
                f"optional pattern {pat!r} consumes variable(s) "
                f"{outside} bound only by an earlier OPTIONAL — "
                "non-well-designed pattern chains are unsupported "
                "(unbound-compatible merge semantics)"
            )
        acc = acc.join(rel, shared, "left")
        bound += [v for v in pvars if v not in bound]
    # SPARQL semantics: distinct variables MAY bind the same term (no
    # implicit disjointness) — callers add FILTER(?a != ?b) style
    # predicates themselves. Column order = first use across patterns.
    acc = acc.select(*bound)
    return acc.distinct() if distinct else acc


def to_ntriples(triples_df: DataFrame, base_iri: str = "http://example.org/") -> DataFrame:
    """(line) — the W3C N-Triples serialization of (subj, pred, obj),
    one statement per row: '<iri> <iri> <iri> .' with terms resolved
    against ``base_iri``. The interchange format every RDF store
    loads; pure projection (map-only, no shuffle), so the sorted-sink
    contract (operators/sinks.py) applies unchanged for publishing.

    Contract: terms must already be IRI-safe path segments (the
    engine's Q-ids and predicate names are); no percent-encoding is
    applied. Rows with a NULL term are dropped rather than emitted as
    malformed statements (concat_ws would silently skip the NULL and
    produce a 2-term line)."""
    iri = lambda c: F.concat(F.lit(f"<{base_iri}"), F.col(c), F.lit(">"))  # noqa: E731
    return (
        triples_df.filter(
            F.col("subj").isNotNull()
            & F.col("pred").isNotNull()
            & F.col("obj").isNotNull()
        )
        .select(
            F.concat_ws(
                " ", iri("subj"), iri("pred"), iri("obj"), F.lit(".")
            ).alias("line")
        )
    )
