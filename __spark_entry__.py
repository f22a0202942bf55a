"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query on sf0.001;
``queries()[name](spark, sf_dir)`` are compared against
``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash). One entry per implemented operator from
SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from btd import analytics as A
from btd.star import EDGES_SQL, edges

SF0001 = "/root/testdata/sf0.001"

QueryFn = Callable[[SparkSession, str], DataFrame]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: widest-shuffle reference analysis (problem 6) — top-10
    triples by distinct-context count over the star-schema edges."""
    return A.top_k_contexts(edges(spark, SF0001), 10)


# --------------------------------------------------------------------------
# reference-parity analyses (SURVEY.md §2) over the star-schema edges
# --------------------------------------------------------------------------


def _q_distinct(spark: SparkSession, sf: str) -> DataFrame:
    return A.distinct_subject_count(edges(spark, sf))


def _q_outdegree_hist(spark: SparkSession, sf: str) -> DataFrame:
    return A.outdegree_histogram(edges(spark, sf))


def _q_indegree_hist(spark: SparkSession, sf: str) -> DataFrame:
    return A.indegree_histogram(edges(spark, sf))


def _q_topk_outdegree(spark: SparkSession, sf: str) -> DataFrame:
    return A.top_k_outdegree(edges(spark, sf), 10)


def _q_percentages(spark: SparkSession, sf: str) -> DataFrame:
    return A.percentages(edges(spark, sf))


def _q_distinct_contexts(spark: SparkSession, sf: str) -> DataFrame:
    return A.distinct_contexts_per_triple(edges(spark, sf))


def _q_top_contexts(spark: SparkSession, sf: str) -> DataFrame:
    return A.top_k_contexts(edges(spark, sf), 10)


def _q_dedup(spark: SparkSession, sf: str) -> DataFrame:
    return A.remove_duplicate_triples(edges(spark, sf))


def queries() -> dict[str, QueryFn]:
    return {
        "ref_distinct_subjects": _q_distinct,
        "ref_outdegree_histogram": _q_outdegree_hist,
        "ref_indegree_histogram": _q_indegree_hist,
        "ref_topk_outdegree": _q_topk_outdegree,
        "ref_percentages": _q_percentages,
        "ref_distinct_contexts": _q_distinct_contexts,
        "ref_top_contexts": _q_top_contexts,
        "ref_dedup": _q_dedup,
    }


def oracle_sql() -> dict[str, str]:
    e = f"WITH edges AS ({EDGES_SQL})"
    return {
        "ref_distinct_subjects": f"""{e}
            SELECT CAST(COUNT(DISTINCT subject) AS BIGINT) AS n_distinct_subjects
            FROM edges""",
        "ref_outdegree_histogram": f"""{e},
            deg AS (SELECT subject, CAST(COUNT(*) AS BIGINT) AS degree
                    FROM edges GROUP BY subject)
            SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
            FROM deg GROUP BY degree""",
        "ref_indegree_histogram": f"""{e},
            deg AS (SELECT object, CAST(COUNT(*) AS BIGINT) AS degree
                    FROM edges GROUP BY object)
            SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
            FROM deg GROUP BY degree""",
        "ref_topk_outdegree": f"""{e}
            SELECT subject AS node, CAST(COUNT(*) AS BIGINT) AS degree
            FROM edges GROUP BY subject
            ORDER BY degree DESC, node DESC LIMIT 10""",
        "ref_percentages": f"""{e}
            SELECT CAST(SUM(CASE WHEN substr(subject, 1, 1) = '_' THEN 1 ELSE 0 END) AS BIGINT) AS blank_subject,
                   CAST(SUM(CASE WHEN substr(object, 1, 1) = '_' THEN 1 ELSE 0 END) AS BIGINT) AS blank_object,
                   CAST(SUM(CASE WHEN context = '' THEN 1 ELSE 0 END) AS BIGINT) AS no_context,
                   CAST(COUNT(*) AS BIGINT) AS total
            FROM edges""",
        "ref_distinct_contexts": f"""{e}
            SELECT subject, predicate, object,
                   CAST(COUNT(DISTINCT context) AS BIGINT) AS n_contexts
            FROM edges GROUP BY subject, predicate, object""",
        "ref_top_contexts": f"""{e}
            SELECT subject, predicate, object,
                   CAST(COUNT(DISTINCT context) AS BIGINT) AS n_contexts
            FROM edges GROUP BY subject, predicate, object
            ORDER BY n_contexts DESC, subject DESC, predicate DESC, object DESC
            LIMIT 10""",
        "ref_dedup": f"""{e}
            SELECT DISTINCT subject, predicate, object FROM edges""",
    }
