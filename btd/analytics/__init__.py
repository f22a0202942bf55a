"""Reference-parity analyses (SURVEY.md §2), one module per problem.

Each function takes a ``triples(subject, predicate, object, context)``
DataFrame and returns a DataFrame — the whole 1-2 MapReduce-job chain of
the reference collapses to a single lazy Catalyst plan per analysis.
"""

from btd.analytics.contexts import distinct_contexts_per_triple, top_k_contexts
from btd.analytics.dedup import remove_duplicate_triples
from btd.analytics.degrees import (
    degree_histogram,
    indegree,
    indegree_histogram,
    outdegree,
    outdegree_histogram,
)
from btd.analytics.distinct import (
    distinct_spo_counts,
    distinct_subject_count,
    distinct_subjects,
)
from btd.analytics.percentages import percentages
from btd.analytics.topk import top_k_outdegree

__all__ = [
    "distinct_subjects",
    "distinct_spo_counts",
    "distinct_subject_count",
    "outdegree",
    "indegree",
    "degree_histogram",
    "outdegree_histogram",
    "indegree_histogram",
    "top_k_outdegree",
    "percentages",
    "distinct_contexts_per_triple",
    "top_k_contexts",
    "remove_duplicate_triples",
]
