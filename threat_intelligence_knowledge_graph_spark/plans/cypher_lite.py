"""Cypher-lite: a translator from the Cypher subset the reference's
users actually run to Catalyst plans over the nodes/edges tables.

The reference's only query surface is a raw Cypher pass-through to
Neo4j (reference neo4j_store.py:175-208, SURVEY.md §2 op 30). The
relational analyst pack in ``plans.graph_queries`` covers the common
questions as named functions; this module closes the remaining gap —
*ad-hoc* pattern queries — so a user migrating from the reference can
keep their MATCH one-liners. Supported subset (everything the
reference's own docs/issues show being run against the store):

- ``MATCH`` with a single linear pattern chain:
  ``(a:Label {prop: 'lit'})-[r:TYPE]->(b)`` — any length, each hop
  directed ``->`` / ``<-`` or undirected ``-``; anonymous nodes/rels.
- ``WHERE`` with AND-joined comparisons on ``var.prop`` (nodes: any
  property, plus the pseudo-properties ``id``/``label``; rels:
  ``type``): ``= <> < <= > >= CONTAINS, STARTS WITH, ENDS WITH, IN``.
  Numeric literals compare numerically (string properties are
  try-cast, Neo4j-style weak typing); strings compare as strings.
- ``RETURN [DISTINCT] item [AS alias], ...`` where item is ``var``
  (node → its id, rel → its type), ``var.prop``, ``count(*)`` or
  ``count(DISTINCT var[.prop])`` — aggregates trigger Cypher's
  implicit grouping over the non-aggregate items.
- ``ORDER BY item [DESC], ...`` (aliases resolvable) and ``LIMIT n``.
- ``OPTIONAL MATCH`` with ONE linear chain anchored at a bound node
  variable: ``MATCH (d:Domain) OPTIONAL MATCH (d)-[r:T]->(i) RETURN…``
  — rows of the required match are kept; unmatched optional variables
  are NULL (a LEFT keyed equi-join). The anchor node must be BARE
  (``(d)``, no label/props — filter it in the required MATCH), the
  other variables new, and any WHERE must precede the OPTIONAL MATCH
  (Neo4j attaches a later WHERE to the optional side; the lite subset
  refuses that rather than silently changing its meaning).

- BOUNDED variable-length hops ``-[:T*lo..hi]->`` / ``-[*n]-`` (hi ≤ 6,
  anonymous only): one row per relationship-unique path, Neo4j's path
  semantics — each length is an unrolled keyed join tree, uniqueness
  enforced by accumulated edge ids. The unbounded forms (``*``,
  ``*2..``) are REFUSED with a pointer at ``bfs_distances``: at 100 TB
  an unbounded expansion needs a frontier operator, not a pattern join.

Translation is declarative end to end: each node variable becomes a
label/property-filtered scan of ``nodes`` (filters push into the
parquet scan), each hop a keyed equi-join against ``edges`` on the
endpoint ids, and the undirected hop a union of the two orientations —
Catalyst prunes/pushes/reorders from there; no per-row Python. There
is deliberately NO general graph-pattern engine here (no write
clauses, no unbounded paths) — at 100 TB those need the dedicated
operators (``bfs_distances``, ``k_truss``, …), which is exactly the
trade the relational store makes.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F


class CypherSyntaxError(ValueError):
    """Raised when a query falls outside the supported subset (named so
    callers can distinguish 'bad query' from engine failures)."""


@dataclass
class _NodePat:
    var: str
    label: str | None = None
    props: dict = field(default_factory=dict)


@dataclass
class _RelPat:
    var: str | None
    rtype: str | None
    direction: str  # '>', '<', or '-'
    lo: int | None = None  # variable-length bounds; None = single hop
    hi: int | None = None


# Bounded variable-length hops: `*n`, `*lo..hi`, `*..hi` (lo defaults
# to 1). Unbounded forms (`*`, `*2..`) and hi > _VLP_MAX_HOPS are
# refused — at 100 TB an unbounded expansion needs the dedicated
# frontier operators (bfs_distances), not a pattern join.
_VLP_MAX_HOPS = 6

_NODE_RE = re.compile(
    r"\(\s*(?P<var>[A-Za-z_]\w*)?\s*(?::\s*(?P<label>[A-Za-z_]\w*))?"
    r"\s*(?P<props>\{[^}]*\})?\s*\)"
)
_REL_RE = re.compile(
    r"(?P<in><)?-\s*(?:\[\s*(?P<var>[A-Za-z_]\w*)?\s*"
    r"(?::\s*(?P<rtype>[A-Za-z_]\w*))?\s*"
    r"(?:(?P<star>\*)\s*(?P<lo>\d+)?\s*(?:(?P<dots>\.\.)\s*(?P<hi>\d+)?)?)?"
    r"\s*\])?\s*-(?P<out>>)?"
)
_PROP_ITEM_RE = re.compile(
    r"""(\w+)\s*:\s*(?:'([^']*)'|"([^"]*)"|(-?\d+(?:\.\d+)?))"""
)
_COND_RE = re.compile(
    r"""^(?P<var>[A-Za-z_]\w*)\.(?P<prop>\w+)\s*
        (?P<op>=|<>|<=|>=|<|>|(?i:CONTAINS)|(?i:STARTS\s+WITH)|
         (?i:ENDS\s+WITH)|(?i:IN))\s*(?P<lit>.+)$""",
    re.VERBOSE,
)
_COUNT_RE = re.compile(
    r"(?i:count)\s*\(\s*(?:(?P<star>\*)|(?i:DISTINCT)\s+"
    r"(?P<var>[A-Za-z_]\w*)(?:\.(?P<prop>\w+))?)\s*\)"
)
_AGG_RE = re.compile(
    r"(?P<fn>(?i:sum|avg|min|max))\s*\(\s*"
    r"(?P<var>[A-Za-z_]\w*)(?:\.(?P<prop>\w+))?\s*\)"
)
_COLLECT_RE = re.compile(
    r"(?i:collect)\s*\(\s*(?P<distinct>(?i:DISTINCT)\s+)?"
    r"(?P<var>[A-Za-z_]\w*)(?:\.(?P<prop>\w+))?\s*\)"
)


def _parse_props(text: str | None) -> dict:
    if not text:
        return {}
    out = {}
    for m in _PROP_ITEM_RE.finditer(text):
        key = m.group(1)
        out[key] = m.group(2) or m.group(3) or m.group(4)
    return out


def _parse_pattern(text: str) -> list:
    """[_NodePat, _RelPat, _NodePat, ...] from one linear MATCH chain."""
    elems: list = []
    pos = 0
    anon = 0
    text = text.strip()
    while pos < len(text):
        if not elems or isinstance(elems[-1], _RelPat):
            m = _NODE_RE.match(text, pos)
            if not m:
                raise CypherSyntaxError(
                    f"expected a node pattern at: {text[pos:pos + 40]!r}"
                )
            var = m.group("var")
            if not var:
                anon += 1
                var = f"_anon{anon}"
            elems.append(
                _NodePat(var, m.group("label"), _parse_props(m.group("props")))
            )
        else:
            m = _REL_RE.match(text, pos)
            if not m:
                raise CypherSyntaxError(
                    f"expected a relationship at: {text[pos:pos + 40]!r}"
                )
            if m.group("in") and m.group("out"):
                raise CypherSyntaxError("relationship cannot point both ways")
            direction = ">" if m.group("out") else ("<" if m.group("in") else "-")
            lo = hi = None
            if m.group("star"):
                if m.group("var"):
                    raise CypherSyntaxError(
                        "a relationship variable on a variable-length hop "
                        "binds a LIST of relationships — outside the lite "
                        "subset (drop the variable)"
                    )
                lo = int(m.group("lo")) if m.group("lo") else 1
                if m.group("dots"):
                    hi = int(m.group("hi")) if m.group("hi") else None
                else:
                    hi = int(m.group("lo")) if m.group("lo") else None
                if hi is None:
                    raise CypherSyntaxError(
                        "unbounded variable-length hops (*) are outside the "
                        "lite subset — use operators.graph_algos."
                        "bfs_distances for unbounded reachability"
                    )
                if lo < 1 or lo > hi:
                    raise CypherSyntaxError(
                        f"invalid variable-length bounds *{lo}..{hi}"
                    )
                if hi > _VLP_MAX_HOPS:
                    raise CypherSyntaxError(
                        f"variable-length hops are capped at "
                        f"{_VLP_MAX_HOPS} (got {hi}) — use "
                        "bfs_distances for deeper reachability"
                    )
            elems.append(
                _RelPat(m.group("var"), m.group("rtype"), direction, lo, hi)
            )
        pos = m.end()
        while pos < len(text) and text[pos].isspace():
            pos += 1
    if not elems or isinstance(elems[-1], _RelPat):
        raise CypherSyntaxError("pattern must end with a node")
    return elems


def _split_clauses(query: str) -> dict:
    """Top-level clause split; keywords are case-insensitive."""
    pattern = re.compile(
        r"\b(OPTIONAL\s+MATCH|MATCH|WHERE|RETURN|ORDER\s+BY|LIMIT)\b",
        re.IGNORECASE,
    )
    hits = list(pattern.finditer(query))
    if not hits or re.sub(r"\s+", " ", hits[0].group(1).upper()) != "MATCH":
        raise CypherSyntaxError("query must start with MATCH")
    clauses: dict = {}
    order: list[str] = []
    for i, h in enumerate(hits):
        key = re.sub(r"\s+", " ", h.group(1).upper())
        end = hits[i + 1].start() if i + 1 < len(hits) else len(query)
        if key in clauses:
            raise CypherSyntaxError(f"duplicate {key} clause")
        clauses[key] = query[h.end():end].strip()
        order.append(key)
    # The lite subset accepts exactly the canonical clause order
    # MATCH [WHERE] [OPTIONAL MATCH] RETURN [ORDER BY] [LIMIT]; since
    # translation applies clauses in that order regardless of where
    # they appeared, any other textual order would be silently
    # reinterpreted (e.g. Neo4j attaches a WHERE *after* OPTIONAL
    # MATCH to the optional side) — refusing beats mistranslating.
    rank = {"MATCH": 0, "WHERE": 1, "OPTIONAL MATCH": 2, "RETURN": 3,
            "ORDER BY": 4, "LIMIT": 5}
    for a, b in zip(order, order[1:]):
        if rank[a] >= rank[b]:
            raise CypherSyntaxError(
                f"{b} cannot follow {a} in the lite subset (clause "
                "order is MATCH [WHERE] [OPTIONAL MATCH] RETURN "
                "[ORDER BY] [LIMIT])"
            )
    return clauses


def _split_top_commas(text: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in text:
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return [p for p in parts if p]


def _parse_literal(text: str):
    text = text.strip()
    if text.startswith("[") and text.endswith("]"):
        return [_parse_literal(t) for t in _split_top_commas(text[1:-1])]
    if (text.startswith("'") and text.endswith("'")) or (
        text.startswith('"') and text.endswith('"')
    ):
        return text[1:-1]
    try:
        return int(text)
    except ValueError:
        pass
    try:
        return float(text)
    except ValueError:
        raise CypherSyntaxError(f"unsupported literal: {text!r}")


class _Plan:
    """Variable bindings + the joined frame under construction."""

    def __init__(self, spark, nodes: DataFrame | None, edges: DataFrame | None):
        self.nodes = nodes if nodes is not None else spark.table("nodes")
        self.edges = edges if edges is not None else spark.table("edges")
        self.kinds: dict[str, str] = {}  # var -> 'node' | 'rel'
        self.df: DataFrame | None = None

    def _node_frame(self, p: _NodePat) -> DataFrame:
        d = self.nodes
        if p.label:
            d = d.filter(F.col("node_label") == p.label)
        for k, v in p.props.items():
            d = d.filter(F.col("properties")[k] == str(v))
        return d.select(
            F.col("node_id").alias(f"{p.var}__id"),
            F.col("node_label").alias(f"{p.var}__label"),
            F.col("properties").alias(f"{p.var}__props"),
        )

    def _rel_frame(self, r: _RelPat, rvar: str) -> DataFrame:
        d = self.edges
        if r.rtype:
            d = d.filter(F.col("rel_type") == r.rtype)
        base = d.select(
            F.col("src_id").alias(f"{rvar}__src"),
            F.col("rel_type").alias(f"{rvar}__type"),
            F.col("dst_id").alias(f"{rvar}__dst"),
        )
        if r.direction == "-":
            # undirected hop: either orientation matches the chain order
            flipped = base.select(
                F.col(f"{rvar}__dst").alias(f"{rvar}__src"),
                F.col(f"{rvar}__type"),
                F.col(f"{rvar}__src").alias(f"{rvar}__dst"),
            )
            return base.unionByName(flipped)
        return base

    def _hop_frame(self, r: _RelPat, hvar: str) -> DataFrame:
        """One traversal hop, direction-normalized so paths always run
        chain-left → chain-right: (hvar__src, hvar__dst, hvar__eid).
        ``__eid`` identifies the PHYSICAL edge (computed before any
        flip), so relationship-uniqueness holds across orientations of
        an undirected hop."""
        d = self.edges
        if r.rtype:
            d = d.filter(F.col("rel_type") == r.rtype)
        eid = F.concat_ws(
            "\x1f", F.col("src_id"), F.col("rel_type"), F.col("dst_id")
        )
        fwd = d.select(
            F.col("src_id").alias(f"{hvar}__src"),
            F.col("dst_id").alias(f"{hvar}__dst"),
            eid.alias(f"{hvar}__eid"),
        )
        rev = d.select(
            F.col("dst_id").alias(f"{hvar}__src"),
            F.col("src_id").alias(f"{hvar}__dst"),
            eid.alias(f"{hvar}__eid"),
        )
        if r.direction == ">":
            return fwd
        if r.direction == "<":
            return rev
        return fwd.unionByName(rev)

    def _var_path_frame(self, r: _RelPat, pvar: str) -> DataFrame:
        """(pvar__start, pvar__end): ONE ROW PER PATH of length
        lo..hi following ``r`` — Neo4j's variable-length semantics,
        including relationship-uniqueness (a path never reuses a
        relationship; node revisits are allowed). Each length extends
        the previous by one keyed equi-join, filtered by
        ``array_contains`` over the ≤ hi accumulated edge ids; the
        per-length frames union. Bounded by ``_VLP_MAX_HOPS``, so the
        plan is a fixed small join tree — filters (rel_type) push into
        every hop scan."""
        h1 = f"{pvar}_h1"
        cur = self._hop_frame(r, h1).select(
            F.col(f"{h1}__src").alias("_s"),
            F.col(f"{h1}__dst").alias("_e"),
            F.array(F.col(f"{h1}__eid")).alias("_eids"),
        )
        lengths = [cur] if r.lo <= 1 else []
        for depth in range(2, r.hi + 1):
            hv = f"{pvar}_h{depth}"
            h = self._hop_frame(r, hv)
            cur = (
                cur.join(h, F.col("_e") == F.col(f"{hv}__src"))
                .filter(~F.array_contains("_eids", F.col(f"{hv}__eid")))
                .select(
                    F.col("_s"),
                    F.col(f"{hv}__dst").alias("_e"),
                    F.concat(
                        "_eids", F.array(F.col(f"{hv}__eid"))
                    ).alias("_eids"),
                )
            )
            if depth >= r.lo:
                lengths.append(cur)
        out = lengths[0]
        for fr in lengths[1:]:
            out = out.unionByName(fr)
        return out.select(
            F.col("_s").alias(f"{pvar}__start"),
            F.col("_e").alias(f"{pvar}__end"),
        )

    def add_chain(
        self, elems: list, prev_node: _NodePat | None = None
    ) -> None:
        """Join ``elems`` into the plan. ``prev_node`` continues an
        already-started chain (the var must be in ``kinds`` with its
        id column present in ``df``); ``elems`` then starts with a
        relationship."""
        anon_rel = len([k for k in self.kinds if k.startswith("_rel")])
        pending_rel: _RelPat | None = None
        for el in elems:
            if isinstance(el, _NodePat):
                if el.var in self.kinds:
                    if self.kinds[el.var] != "node":
                        raise CypherSyntaxError(
                            f"{el.var} used as both node and relationship"
                        )
                    # re-binding an existing node var closes a cycle:
                    # not supported in the lite subset
                    raise CypherSyntaxError(
                        f"variable {el.var} bound twice (cyclic patterns "
                        "are outside the lite subset)"
                    )
                nf = self._node_frame(el)
                self.kinds[el.var] = "node"
                if self.df is None:
                    self.df = nf
                elif (
                    pending_rel is not None
                    and pending_rel.lo is not None
                    and prev_node is not None
                ):
                    anon_rel += 1
                    pvar = f"_vlp{anon_rel}_{prev_node.var}_{el.var}"
                    pf = self._var_path_frame(pending_rel, pvar)
                    self.df = self.df.join(
                        pf,
                        F.col(f"{prev_node.var}__id")
                        == F.col(f"{pvar}__start"),
                    ).join(nf, F.col(f"{pvar}__end") == F.col(f"{el.var}__id"))
                    pending_rel = None
                elif pending_rel is not None and prev_node is not None:
                    r = pending_rel
                    rvar = r.var
                    if not rvar:
                        anon_rel += 1
                        rvar = f"_rel{anon_rel}_{prev_node.var}_{el.var}"
                    if rvar in self.kinds:
                        raise CypherSyntaxError(f"variable {rvar} bound twice")
                    self.kinds[rvar] = "rel"
                    rf = self._rel_frame(r, rvar)
                    if r.direction == "<":
                        left_key, right_key = f"{rvar}__dst", f"{rvar}__src"
                    else:
                        left_key, right_key = f"{rvar}__src", f"{rvar}__dst"
                    self.df = self.df.join(
                        rf, F.col(f"{prev_node.var}__id") == F.col(left_key)
                    ).join(nf, F.col(right_key) == F.col(f"{el.var}__id"))
                    pending_rel = None
                prev_node = el
            else:
                pending_rel = el

    def expr(self, var: str, prop: str | None):
        if var not in self.kinds:
            raise CypherSyntaxError(f"unknown variable {var!r}")
        kind = self.kinds[var]
        if kind == "rel":
            if prop in (None, "type"):
                return F.col(f"{var}__type")
            raise CypherSyntaxError(
                f"relationships expose only .type (got .{prop})"
            )
        if prop is None or prop == "id":
            return F.col(f"{var}__id")
        if prop == "label":
            return F.col(f"{var}__label")
        return F.col(f"{var}__props")[prop]


def _apply_where(plan: _Plan, clause: str) -> None:
    for cond in re.split(r"\bAND\b", clause, flags=re.IGNORECASE):
        cond = cond.strip()
        if not cond:
            continue
        m = _COND_RE.match(cond)
        if not m:
            raise CypherSyntaxError(f"unsupported WHERE condition: {cond!r}")
        col = plan.expr(m.group("var"), m.group("prop"))
        op = re.sub(r"\s+", " ", m.group("op").upper())
        lit = _parse_literal(m.group("lit"))
        if op in ("CONTAINS", "STARTS WITH", "ENDS WITH"):
            if not isinstance(lit, str):
                raise CypherSyntaxError(f"{op} needs a string literal")
            fn = {
                "CONTAINS": F.contains,
                "STARTS WITH": F.startswith,
                "ENDS WITH": F.endswith,
            }[op]
            pred = fn(col, F.lit(lit))
        elif op == "IN":
            if not isinstance(lit, list):
                raise CypherSyntaxError("IN needs a [list] literal")
            pred = col.isin([str(v) if not isinstance(v, str) else v for v in lit])
        else:
            rhs = F.lit(lit)
            lhs = col
            if isinstance(lit, (int, float)):
                lhs = col.cast("double")  # Neo4j-style numeric comparison
                rhs = F.lit(float(lit))
            pred = {
                "=": lhs == rhs,
                "<>": lhs != rhs,
                "<": lhs < rhs,
                "<=": lhs <= rhs,
                ">": lhs > rhs,
                ">=": lhs >= rhs,
            }[op]
        plan.df = plan.df.filter(pred)


def _apply_optional(plan: _Plan, clause: str) -> None:
    """LEFT-join one optional linear chain anchored at a bound node.

    The optional side starts DIRECTLY from the first hop's edge frame
    (no re-scan of ``nodes`` for the bare anchor — its id is already a
    column of the required plan); the rest of the chain is built by
    the same ``add_chain`` machinery in a sub-plan, so hops/labels/
    props/directions behave identically to a required MATCH — only the
    join type differs.
    """
    chains = _split_top_commas(clause)
    if len(chains) != 1:
        raise CypherSyntaxError(
            "exactly one linear OPTIONAL MATCH chain is supported"
        )
    elems = _parse_pattern(chains[0])
    if len(elems) < 3:
        raise CypherSyntaxError("OPTIONAL MATCH needs at least one hop")
    anchor = elems[0]
    if anchor.var.startswith("_anon") or plan.kinds.get(anchor.var) != "node":
        raise CypherSyntaxError(
            "OPTIONAL MATCH must start at a node variable bound by MATCH"
        )
    if anchor.label or anchor.props:
        raise CypherSyntaxError(
            "the OPTIONAL MATCH anchor must be bare (filter it in the "
            "required MATCH): " + anchor.var
        )
    for el in elems[1:]:
        if el.var and el.var in plan.kinds:
            raise CypherSyntaxError(
                f"variable {el.var} bound twice (only the anchor may be "
                "shared)"
            )
    first_rel, first_node = elems[1], elems[2]
    sub = _Plan(None, plan.nodes, plan.edges)
    if first_rel.lo is not None:
        pvar = f"_vlp_opt_{anchor.var}_{first_node.var}"
        pf = sub._var_path_frame(first_rel, pvar)
        nf = sub._node_frame(first_node)
        sub.kinds[first_node.var] = "node"
        sub.df = pf.join(
            nf, F.col(f"{pvar}__end") == F.col(f"{first_node.var}__id")
        )
        if len(elems) > 3:
            sub.add_chain(elems[3:], prev_node=first_node)
        plan.df = plan.df.join(
            sub.df,
            F.col(f"{anchor.var}__id") == F.col(f"{pvar}__start"),
            "left",
        )
        for var, kind in sub.kinds.items():
            plan.kinds[var] = kind
        return
    rvar = first_rel.var
    if not rvar:
        rvar = f"_rel_opt_{anchor.var}_{first_node.var}"
        while rvar in plan.kinds:  # a user var may share the shape
            rvar += "_"
    sub.kinds[rvar] = "rel"
    rf = sub._rel_frame(first_rel, rvar)
    if first_rel.direction == "<":
        anchor_key, node_key = f"{rvar}__dst", f"{rvar}__src"
    else:
        anchor_key, node_key = f"{rvar}__src", f"{rvar}__dst"
    nf = sub._node_frame(first_node)
    sub.kinds[first_node.var] = "node"
    sub.df = rf.join(nf, F.col(node_key) == F.col(f"{first_node.var}__id"))
    if len(elems) > 3:
        sub.add_chain(elems[3:], prev_node=first_node)
    plan.df = plan.df.join(
        sub.df,
        F.col(f"{anchor.var}__id") == F.col(anchor_key),
        "left",
    )
    for var, kind in sub.kinds.items():
        plan.kinds[var] = kind


def _parse_return_item(plan: _Plan, item: str):
    """→ (output_name, column_or_None, agg_column_or_None)."""
    alias = None
    m = re.search(r"\s+(?i:AS)\s+([A-Za-z_]\w*)\s*$", item)
    if m:
        alias = m.group(1)
        item = item[: m.start()].strip()
    cm = _COUNT_RE.fullmatch(item.strip())
    if cm:
        name = alias or "count"
        if cm.group("star"):
            return name, None, F.count(F.lit(1)).alias(name)
        col = plan.expr(cm.group("var"), cm.group("prop"))
        return name, None, F.count_distinct(col).alias(name)
    lm = _COLLECT_RE.fullmatch(item.strip())
    if lm:
        name = alias or "collect"
        col = plan.expr(lm.group("var"), lm.group("prop"))
        inner = F.collect_set(col) if lm.group("distinct") else F.collect_list(col)
        # Neo4j's collect() is insertion-ordered (nondeterministic under
        # parallel scan); the lite subset pins SORTED lists so results
        # are engine/partitioning-reproducible.
        return name, None, F.sort_array(inner).alias(name)
    am = _AGG_RE.fullmatch(item.strip())
    if am:
        fn = am.group("fn").lower()
        name = alias or fn
        col = plan.expr(am.group("var"), am.group("prop"))
        if fn in ("sum", "avg"):
            # numeric aggregate over string-typed properties: weak
            # typing, the WHERE-comparison rule (non-numeric → NULL,
            # ignored by the aggregate — Neo4j skips non-numerics too)
            col = col.cast("double")
        agg = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}[fn](col)
        return name, None, agg.alias(name)
    vm = re.fullmatch(r"([A-Za-z_]\w*)(?:\.(\w+))?", item.strip())
    if not vm:
        raise CypherSyntaxError(f"unsupported RETURN item: {item!r}")
    var, prop = vm.group(1), vm.group(2)
    name = alias or (f"{var}.{prop}" if prop else var)
    return name, plan.expr(var, prop).alias(name), None


def cypher_query(
    spark: SparkSession,
    query: str,
    nodes: DataFrame | None = None,
    edges: DataFrame | None = None,
) -> DataFrame:
    """Translate a Cypher-lite query (module docstring grammar) into a
    DataFrame over the ``nodes``/``edges`` tables (temp views by
    default; pass frames explicitly for ad-hoc graphs/tests)."""
    clauses = _split_clauses(query.strip().rstrip(";"))
    if "RETURN" not in clauses:
        raise CypherSyntaxError("RETURN clause is required")
    plan = _Plan(spark, nodes, edges)
    chains = _split_top_commas(clauses["MATCH"])
    if len(chains) != 1:
        # comma patterns without shared variables are a cartesian
        # product — never what you want over a 100 TB edge table, and
        # shared variables (cycles) are outside the lite subset too.
        raise CypherSyntaxError(
            "exactly one linear MATCH chain is supported"
        )
    plan.add_chain(_parse_pattern(chains[0]))
    if plan.df is None:
        raise CypherSyntaxError("empty MATCH pattern")
    if "WHERE" in clauses:
        _apply_where(plan, clauses["WHERE"])
    if "OPTIONAL MATCH" in clauses:
        _apply_optional(plan, clauses["OPTIONAL MATCH"])

    ret = clauses["RETURN"]
    distinct = False
    dm = re.match(r"(?i:DISTINCT)\s+", ret)
    if dm:
        distinct = True
        ret = ret[dm.end():]
    items = [_parse_return_item(plan, i) for i in _split_top_commas(ret)]
    if not items:
        raise CypherSyntaxError("RETURN needs at least one item")
    keys = [c for _, c, _ in items if c is not None]
    aggs = [a for _, _, a in items if a is not None]
    if aggs:
        if distinct:
            raise CypherSyntaxError("DISTINCT with aggregates is unsupported")
        out = plan.df.groupBy(*keys).agg(*aggs) if keys else plan.df.agg(*aggs)
        out = out.select(*[name for name, _, _ in items])
    else:
        out = plan.df.select(*keys)
        if distinct:
            out = out.distinct()

    if "ORDER BY" in clauses:
        order_cols = []
        out_names = set(out.columns)
        for ob in _split_top_commas(clauses["ORDER BY"]):
            desc = bool(re.search(r"\s+(?i:DESC)\s*$", ob))
            ob_core = re.sub(r"\s+(?i:DESC|ASC)\s*$", "", ob).strip()
            if ob_core in out_names:
                c = F.col(ob_core)
            else:
                vm = re.fullmatch(r"([A-Za-z_]\w*)(?:\.(\w+))?", ob_core)
                if not vm:
                    raise CypherSyntaxError(f"unsupported ORDER BY: {ob!r}")
                # ORDER BY on a non-returned expression requires it to
                # be a returned column in the lite subset
                name = ob_core
                if name not in out_names:
                    raise CypherSyntaxError(
                        f"ORDER BY {ob_core!r} must appear in RETURN"
                    )
                c = F.col(name)
            order_cols.append(c.desc() if desc else c.asc())
        out = out.orderBy(*order_cols)
    if "LIMIT" in clauses:
        try:
            n = int(clauses["LIMIT"])
        except ValueError:
            raise CypherSyntaxError(f"LIMIT needs an integer: {clauses['LIMIT']!r}")
        out = out.limit(n)
    return out
