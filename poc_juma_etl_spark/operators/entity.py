"""Entity resolution / golden-record construction over structured records.

The MDM (master-data-management) capability: records that describe the
same real-world entity under slightly different names are (1) blocked on a
cheap exact key, (2) pair-scored with a bounded edit distance, (3) grouped
into entities by connected components over the match graph, and (4)
collapsed to one canonical "golden record" per entity with survivorship
rules deciding each attribute. Distinct from the document-dedup family:
the inputs are records with typed attributes, and the deliverable is the
surviving record, not the duplicate pairs.

Scale shape:
- pair scoring uses the thresholded levenshtein (banded DP, early
  abandon) inside brand blocks — candidates never leave their block;
- clustering is the same iterative min-label propagation as
  q_dedup_components (two hash shuffles per round, no driver graph);
- survivorship is one aggregation per entity: MIN for the id, MAX for
  the price (highest-value-wins stand-in for freshest-source-wins), and
  the canonical name rides a MAX(CASE) on the id-winning member — no
  per-entity row collection anywhere.

The oracle replays matching + closure with a recursive CTE (transitive
closure — a different algorithm reaching the same fixpoint) and the same
survivorship aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.queries import register
from .components import connected_components

ER_LEV_MAX = 2


def er_match_edges(p: DataFrame, lev_max: int = ER_LEV_MAX) -> DataFrame:
    """(src, dst) partkey pairs whose names match within ``lev_max`` edits,
    brand-blocked, scored with the early-abandon banded levenshtein."""
    a = p.alias("a")
    b = p.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"), lev_max)
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .filter(dist >= 0)  # thresholded form yields −1 above lev_max
        .select(
            F.col("a.p_partkey").alias("src"), F.col("b.p_partkey").alias("dst")
        )
    )


@register(
    "q_entity_resolution",
    oracle=f"""
    WITH RECURSIVE
    e AS (
      SELECT a.p_partkey AS pa, b.p_partkey AS pb
      FROM part a JOIN part b
        ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
      WHERE levenshtein(a.p_name, b.p_name) <= {ER_LEV_MAX}
    ),
    sym AS (SELECT pa AS a, pb AS b FROM e UNION SELECT pb, pa FROM e),
    reach(node, r) AS (
      SELECT a, a FROM sym
      UNION
      SELECT s.a, reach.r FROM sym s JOIN reach ON reach.node = s.b
    ),
    membership AS (SELECT node AS p_partkey, MIN(r) AS entity_id FROM reach GROUP BY node),
    clustered AS (
      SELECT p.p_partkey, p.p_name, p.p_retailprice,
             COALESCE(m.entity_id, p.p_partkey) AS entity_id
      FROM part p LEFT JOIN membership m USING (p_partkey)
    )
    SELECT entity_id,
           MAX(CASE WHEN p_partkey = entity_id THEN p_name END) AS canonical_name,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           MAX(p_retailprice) AS best_price
    FROM clustered
    GROUP BY entity_id
    ORDER BY entity_id
    """,
    doc=f"Entity resolution to golden records: brand-blocked name matching "
    f"(banded levenshtein ≤ {ER_LEV_MAX}, early abandon), min-label "
    "propagation clustering (no driver graph), then one survivorship "
    "aggregate per entity — MIN key as the entity id, that member's name "
    "as canonical, MAX price as the surviving value, member count. "
    "Singletons survive as their own entity. Oracle reaches the same "
    "fixpoint via recursive-CTE transitive closure.",
    tags=("entity", "dedup", "graph", "mdm"),
)
def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name", "p_brand", "p_retailprice")
    return golden_records(p)


def golden_records(p: DataFrame) -> DataFrame:
    """Golden records for ``p`` (p_partkey, p_name, p_brand, p_retailprice):
    match → cluster → survivorship, one row per resolved entity."""
    comp = connected_components(er_match_edges(p))
    clustered = (
        p.join(comp, p.p_partkey == comp.node, "left")
        .select(
            "p_partkey",
            "p_name",
            "p_retailprice",
            F.coalesce(F.col("comp"), F.col("p_partkey")).alias("entity_id"),
        )
    )
    return (
        clustered.groupBy("entity_id")
        .agg(
            F.max(
                F.when(F.col("p_partkey") == F.col("entity_id"), F.col("p_name"))
            ).alias("canonical_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.max("p_retailprice").alias("best_price"),
        )
        .orderBy("entity_id")
    )
