from crawl4ai_spark.operators.scorers import (  # noqa: F401
    keyword_relevance_score,
    path_depth_score,
    content_type_score,
    freshness_score,
    domain_authority_score,
    composite_score,
)
from crawl4ai_spark.operators.filters import (  # noqa: F401
    FilterChain,
    url_pattern_filter,
    content_type_filter,
    domain_filter,
    nonsense_url_filter,
    url_validity_filter,
)
from crawl4ai_spark.operators.politeness import host_budget_rank, apply_host_budget  # noqa: F401
from crawl4ai_spark.operators.robots import robots_allowed_udf, apply_robots_gate  # noqa: F401
from crawl4ai_spark.operators.seen import BloomFilterSet, dedup_against_seen  # noqa: F401
from crawl4ai_spark.operators.ranking import priority_rank, capacity_topk  # noqa: F401
