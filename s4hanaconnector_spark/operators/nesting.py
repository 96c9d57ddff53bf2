"""Business-object nesting (E14 / O32) — the reference's legacy/latent
hierarchical data model, implemented natively.

Reference: mapping JSON carries ``relations[{detail, schemafield,
joincondition[{left, right}]}]`` (golden sample tmp JSON:76-160) and the UI5
editor builds master+detail join conditions (EditBusinessObject.view:72-105);
the Java parser never materializes it (parseValues,
S4HanaTableMapping.java:248-254 copies only the flat keys). In Spark, nested
documents are first-class: detail rows become an ``ArrayType(StructType)``
field on the master row.

Scale notes: the groupBy(collect_list) shuffles detail rows once on the join
key. For 100 TB, pre-bucket master and detail on the join key so both the
join and the aggregation are co-partitioned (single shuffle-free stage);
``array_sort`` keeps the nested array deterministic without a global sort.
Guard against hot keys: a single master with millions of detail rows will
blow executor memory — cap with ``slice`` after sorting if the model allows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def nest(
    master: DataFrame,
    detail: DataFrame,
    joincondition: list[dict],
    schemafield: str,
    detail_cols: list[str] | None = None,
    sort_detail_by: list[str] | None = None,
) -> DataFrame:
    """Nest ``detail`` rows under each ``master`` row as an array of structs.

    ``joincondition`` uses the reference's JSON shape:
    ``[{"left": master_col, "right": detail_col}, ...]``.

    Implementation: aggregate the detail side FIRST (one struct array per
    join key), then LEFT-join the (now key-unique) aggregate onto master —
    agg-before-join keeps the join's right side small and skew-resistant,
    the same plan-shape rule as the CDC delta (SURVEY §4). Masters without
    details get an empty array (not NULL), matching document semantics.
    """
    left_keys = [jc["left"] for jc in joincondition]
    right_keys = [jc["right"] for jc in joincondition]
    dcols = detail_cols or [c for c in detail.columns if c not in right_keys]
    sort_keys = sort_detail_by or dcols

    struct_col = F.struct(*[F.col(c) for c in dcols])
    grouped = (
        detail.groupBy(*[F.col(k) for k in right_keys])
        .agg(F.array_sort(F.collect_list(struct_col)).alias(schemafield))
    )
    cond = [master[l] == grouped[r] for l, r in zip(left_keys, right_keys)]
    joined = master.join(grouped, cond, "left")
    return joined.select(
        *[master[c] for c in master.columns],
        F.coalesce(F.col(schemafield), F.array().cast(grouped.schema[schemafield].dataType)).alias(
            schemafield
        ),
    )


def materialize_business_object(mapping, load_table, keep_keys: tuple = ()):
    """Walk a TableMapping's ``relations`` tree RECURSIVELY (the reference's
    latent model allows relations inside detail mappings, tmp JSON:148) and
    materialize the full nested document: master projection, one
    ArrayType(StructType) field per relation, details nested depth-first so
    a detail's own relations appear inside its structs.

    ``load_table(name) -> DataFrame`` supplies source tables.  ``keep_keys``
    are join-key columns a parent needs that are not in this level's
    columnmappings (they are projected through but excluded from the parent's
    nested struct).

    Scale: each nesting level is one groupBy(collect_list) + left join on
    the relation key — at 100 TB, co-bucket master and details on the join
    keys (operators/bucketing.py) and every level is shuffle-free.
    """
    df = load_table(mapping.mastertable)
    aliases = {cm.alias for cm in mapping.columnmappings}
    extra = [F.col(k) for k in keep_keys if k not in aliases]
    out = df.select(*extra, *mapping.projection())
    for rel in mapping.relations:
        right_keys = tuple(jc["right"] for jc in rel.joincondition)
        detail = materialize_business_object(rel.detail, load_table, right_keys)
        out = nest(
            out,
            detail,
            joincondition=rel.joincondition,
            schemafield=rel.schemafield,
            detail_cols=[c for c in detail.columns if c not in right_keys],
        )
    return out
