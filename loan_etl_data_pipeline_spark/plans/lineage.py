"""Column-level lineage from the ANALYZED logical plan.

Impact analysis is table stakes for a warehouse ("which source columns
feed this metric?" before a schema change; "is this output derived from
PII?" for governance) and the reference — like most hand-rolled
pipelines — has nothing: its transformations are opaque Python
(reference: airflow/dags/etl/pyspark_etl.py). Spark already KNOWS the
answer for every DataFrame: the analyzed plan's attributes carry stable
expression ids, and every derived column is a NamedExpression whose
``references`` close transitively over its children. This walks that
structure — no string parsing, no regexes over plan text.

Semantics: DATA lineage only — an output column depends on the source
columns that flow into its VALUE. Columns consumed solely by filters or
join conditions shape which ROWS appear but not the values, and are
reported separately as ``control`` dependencies (the
governance-relevant distinction: a metric filtered by PII is not itself
PII-derived).

Scale note: this inspects plan metadata on the driver — O(plan size),
never touches data, safe on a plan over 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _seq(jseq):
    return [jseq.apply(i) for i in range(jseq.size())]


def _refs(jexpr):
    out = []
    it = jexpr.references().iterator()
    while it.hasNext():
        out.append(it.next())
    return out


def _leaf_label(node) -> str:
    name = node.getClass().getSimpleName()
    try:
        # LogicalRelation over a file source: use the root path — the
        # label a human recognizes
        paths = node.relation().location().rootPaths()
        if paths.size() > 0:
            return paths.apply(0).toString()
    except Exception:
        pass
    return name


def column_lineage(df: DataFrame) -> dict[str, dict[str, set[tuple[str, str]]]]:
    """Map each output column of ``df`` to its source columns.

    Returns ``{out_col: {"data": {(source, col), ...},
    "control": {(source, col), ...}}}`` where ``source`` is the leaf
    relation's root path (or leaf class name when pathless, e.g. a
    LocalRelation from createDataFrame). ``data`` = columns feeding the
    value. ``control`` = columns that only gate rows (filters / join
    keys / sort keys) ANYWHERE in the plan — deliberately PLAN-WIDE,
    not attributed per column: every filter in any join/union branch
    shapes which output rows exist (through join multiplicity / branch
    membership), so the plan-global set is the row-population gate of
    the result, shared by all output columns (minus each column's own
    data deps). This is a conservative over-approximation in the safe
    direction for governance — a PII gate is never MISSED; a column
    from one union branch does inherit the other branch's filter
    columns (ADVICE r4 notes the over-report; consumers needing
    per-branch attribution should lineage the branches separately).
    """
    plan = df._jdf.queryExecution().analyzed()

    # attr exprId -> set[(source, col)] for DATA deps, plus the set of
    # control columns accumulated under each node
    def walk(node):
        children = _seq(node.children())
        if not children:
            label = _leaf_label(node)
            m = {
                a.exprId().id(): {(label, a.name())}
                for a in _seq(node.output())
            }
            return m, set()

        m: dict[int, set] = {}
        control: set = set()
        child_maps = []
        for ch in children:
            cm, cc = walk(ch)
            child_maps.append(cm)
            m.update(cm)
            control |= cc

        # Union reuses the FIRST child's expr ids for its output, so a
        # plain id lookup would drop every other branch: merge deps
        # column-position-wise across all children
        if node.getClass().getSimpleName() == "Union":
            for i, a in enumerate(_seq(node.output())):
                deps: set = set()
                for ch, cm in zip(children, child_maps):
                    ch_attr = _seq(ch.output())[i]
                    deps |= cm.get(ch_attr.exprId().id(), set())
                m[a.exprId().id()] = deps
            return m, control

        # expressions that DEFINE an output attribute contribute data
        # deps; every other expression on the node (join condition,
        # filter predicate, sort key) is control
        defined: dict[int, set] = {}
        out_ids = {a.exprId().id() for a in _seq(node.output())}
        for e in _seq(node.expressions()):
            eid = None
            try:
                attr = e.toAttribute()
                eid = attr.exprId().id()
            except Exception:
                eid = None
            deps = set()
            for r in _refs(e):
                deps |= m.get(r.exprId().id(), set())
            if eid is not None and eid in out_ids and eid not in m:
                defined[eid] = deps
            elif eid is None or eid not in out_ids:
                control |= deps
        m.update(defined)
        return m, control

    m, control = walk(plan)
    out: dict[str, dict[str, set]] = {}
    names = [a.name() for a in _seq(plan.output())]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        # keying by name would silently hand one column's lineage to a
        # governance check asking about the other — refuse instead
        raise ValueError(
            f"output has duplicate column names {sorted(dupes)}: "
            "disambiguate with aliases before asking for lineage"
        )
    for a in _seq(plan.output()):
        data = m.get(a.exprId().id(), set())
        out[a.name()] = {"data": set(data), "control": set(control) - set(data)}
    return out
