"""Gremlin-string mini-parser for the shell.

The reference's users type Gremlin traversals at its REPL
(``/root/reference/README.md:419-489``); this module parses that
surface — the §2.8 traversal list, not the whole Gremlin language —
onto :class:`grafink_spark.graph.query.GraphQuery` calls, so a
migrating user can paste their queries unchanged:

    g.V().count()                                → int
    g.V().has("objectId", "ZTF19acmcetc")        → vertex DataFrame
    g.V().has("objectId", "x").next()            → first Row (or None)
    g.V().outE("similarity").has("value", 2)     → edge DataFrame
    g.V("28928").outE("similarity")              → edges from vertex 28928
    g.V().has("recipe", "asteroids").outE().count() → int (degree sum)
    g.V(28928).valueMap(true)                    → dict
    g.V().groupCount().by(label)                 → per-label count DataFrame
    g.V(28928).out("similarity")                 → neighbor-id DataFrame

Terminal no-ops from the reference transcripts (``.next()``,
``.toList()``, ``.asScala``, ``.iterate()``) are accepted; ``next``
materializes the first row, ``toList`` collects. Everything stays a
lazy DataFrame plan until one of those terminals (or ``count``) runs.

Scope is deliberately the reference's documented query set — anything
else raises GremlinParseError naming the unsupported step.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grafink_spark.graph.query import GraphQuery
from grafink_spark.rules.base import DST, SRC


class GremlinParseError(ValueError):
    pass


@dataclass
class Step:
    name: str
    args: list


_STEP_RE = re.compile(r"\s*\.?\s*(\w+)\s*\(")
_ARG_RE = re.compile(
    r"""\s*(?:'([^']*)'|"([^"]*)"|([A-Za-z_][\w.]*)|(-?\d+\.\d+)|(-?\d+))\s*(?:,|$)"""
)


def _parse_args(raw: str) -> list:
    raw = raw.strip()
    if not raw:
        return []
    args, pos = [], 0
    while pos < len(raw):
        m = _ARG_RE.match(raw, pos)
        if not m:
            raise GremlinParseError(f"cannot parse arguments: {raw[pos:]!r}")
        s1, s2, ident, flt, intg = m.groups()
        if s1 is not None or s2 is not None:
            args.append(s1 if s1 is not None else s2)
        elif flt is not None:
            args.append(float(flt))
        elif intg is not None:
            args.append(int(intg))
        else:
            low = ident.lower()
            if low == "true":
                args.append(True)
            elif low == "false":
                args.append(False)
            else:
                args.append(ident)  # bare identifier, e.g. label / T.label
        pos = m.end()
    return args


def _find_close(q: str, start: int) -> int:
    """Index of the step's closing paren, ignoring parens inside quoted
    string arguments (e.g. has("objectId", "AT2019(bkz)"))."""
    quote = None
    for i in range(start, len(q)):
        c = q[i]
        if quote:
            if c == quote:
                quote = None
        elif c in ("'", '"'):
            quote = c
        elif c == ")":
            return i
    return -1


def parse(query: str) -> list[Step]:
    """``g.V().outE("x").has("value", 2).next()`` → [Step, ...]."""
    q = query.strip().rstrip(";")
    if not q.startswith("g"):
        raise GremlinParseError("traversal must start with 'g'")
    pos = 1
    steps: list[Step] = []
    while pos < len(q):
        m = _STEP_RE.match(q, pos)
        if not m:
            # bare property access like ".asScala" (no parens)
            b = re.match(r"\s*\.\s*(\w+)\s*", q[pos:])
            if b:
                steps.append(Step(b.group(1), []))
                pos += b.end()
                continue
            raise GremlinParseError(f"cannot parse at: {q[pos:]!r}")
        name = m.group(1)
        close = _find_close(q, m.end())
        if close < 0:
            raise GremlinParseError(f"unbalanced parens in {query!r}")
        try:
            args = _parse_args(q[m.end() : close])
        except GremlinParseError as e:
            raise GremlinParseError(
                f"in step {name}(...): {e} — nested-traversal steps "
                "(repeat/where/by(traversal)) are outside the supported "
                "§2.8 surface"
            ) from None
        steps.append(Step(name, args))
        pos = close + 1
    if not steps:
        raise GremlinParseError("empty traversal")
    return steps


_EDGE_PROP = {"value": "propVal"}  # reference edge property → column


class GremlinExecutor:
    """Evaluates a parsed traversal against GraphQuery's tables."""

    def __init__(self, g: GraphQuery):
        self.g = g

    def run(self, query: str):
        steps = parse(query)
        if steps[0].name != "V":
            raise GremlinParseError("traversal must start with g.V(...)")
        df = self.g.store.vertices()
        mode = "vertices"
        # explicit restriction tracking (NOT plan sniffing): set by
        # V(ids...), has() on vertices, and limit() on vertices — outE
        # must semi-join whenever the upstream vertex set is narrowed
        restricted = False
        vertex_id = None  # single-id fast path (src pushdown, valueMap)
        ids = [self._vid(a) for a in steps[0].args]
        if ids:
            restricted = True
            if len(ids) == 1:
                vertex_id = ids[0]
                df = df.where(F.col("id") == vertex_id)
            else:
                df = df.where(F.col("id").isin(ids))
        done = None  # set once a terminal materializes a python value
        it = iter(steps[1:])
        for step in it:
            if done is not None:
                # only transcript no-ops may follow a materialized value
                # (e.g. g.V().count().next() in the reference REPL log)
                if step.name in ("next", "toList", "asScala", "iterate"):
                    continue
                raise GremlinParseError(
                    f"step {step.name}() after a terminal step has no "
                    "effect — remove it or split the traversal"
                )
            if step.name == "has":
                if len(step.args) != 2:
                    raise GremlinParseError("has(key, value) takes 2 args")
                k, v = step.args
                if mode == "edges":
                    col = _EDGE_PROP.get(k, k)
                    # edge propVal is stored as string (reference parity)
                    df = df.where(F.col(col) == F.lit(str(v)))
                else:
                    df = df.where(F.col(k) == F.lit(v))
                    restricted = True
            elif step.name in ("outE", "inE", "bothE"):
                # the store materializes BOTH directions of every edge,
                # so inE anchors on dst and bothE matches either end
                label = step.args[0] if step.args else None
                edges = self.g.out_e(label)
                anchor = {"outE": [SRC], "inE": [DST], "bothE": [SRC, DST]}[
                    step.name
                ]
                if vertex_id is not None:
                    cond = anchor[0]
                    m = F.col(cond) == vertex_id
                    for c in anchor[1:]:
                        m = m | (F.col(c) == vertex_id)
                    df = edges.where(m)
                elif restricted:
                    # semi-join: only edges anchored in the vertex set
                    ids = df.select("id")
                    matched = edges.join(
                        ids.select(F.col("id").alias(anchor[0])),
                        anchor[0],
                        "left_semi",
                    )
                    for c in anchor[1:]:
                        matched = matched.unionByName(
                            edges.join(
                                ids.select(F.col("id").alias(c)),
                                c,
                                "left_semi",
                            )
                        ).distinct()
                    df = matched
                else:
                    df = edges
                mode = "edges"
            elif step.name in ("out", "in", "both"):
                label = step.args[0] if step.args else None
                if vertex_id is None:
                    raise GremlinParseError(f"{step.name}() needs g.V(<id>)")
                # both directions are materialized: in == out over the
                # reverse rows; both == distinct union of the two
                if step.name == "out":
                    df = self.g.neighbors(vertex_id, label)
                elif step.name == "in":
                    df = (
                        self.g.out_e(label)
                        .where(F.col(DST) == vertex_id)
                        .select(F.col(SRC).alias("neighbor_id"))
                    )
                else:
                    df = (
                        self.g.neighbors(vertex_id, label)
                        .unionByName(
                            self.g.out_e(label)
                            .where(F.col(DST) == vertex_id)
                            .select(F.col(SRC).alias("neighbor_id"))
                        )
                        .distinct()
                    )
                mode = "neighbors"
            elif step.name == "count":
                done = df.count()
            elif step.name == "groupCount":
                by = next(it, None)
                if by is None or by.name != "by":
                    raise GremlinParseError("groupCount() needs .by(label)")
                key = by.args[0] if by.args else "label"
                if key in ("label", "T.label"):
                    key = "label"
                df = df.groupBy(key).agg(F.count(F.lit(1)).alias("count"))
            elif step.name == "valueMap":
                if vertex_id is None:
                    raise GremlinParseError("valueMap needs g.V(<id>)")
                done = self.g.value_map(vertex_id)
            elif step.name == "limit":
                df = df.limit(int(step.args[0]))
                if mode == "vertices":
                    restricted = True
            elif step.name == "next":
                rows = df.take(1)
                done = rows[0] if rows else None
                if done is None:
                    return None
            elif step.name == "toList":
                done = df.collect()
            elif step.name in ("asScala", "iterate", "fold"):
                continue  # transcript no-ops on a DataFrame
            else:
                raise GremlinParseError(
                    f"unsupported Gremlin step: {step.name}() — supported: "
                    "V, has, outE/inE/bothE, out/in/both, count, "
                    "groupCount().by, valueMap, limit, next, toList"
                )
        return df if done is None else done

    @staticmethod
    def _vid(arg) -> int:
        """Vertex ids are longs; accept the quoted form the reference's
        transcripts use (g.V("28928"))."""
        try:
            return int(arg)
        except (TypeError, ValueError):
            raise GremlinParseError(
                f"V() takes numeric vertex ids, got {arg!r} — property "
                'lookups go through has(), e.g. g.V().has("objectId", ...)'
            ) from None


def gremlin(g: GraphQuery, query: str):
    """One-call surface: ``gremlin(g, 'g.V().count()')``."""
    return GremlinExecutor(g).run(query)
