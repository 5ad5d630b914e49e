from crawl4ai_spark.functions.urlnorm import (  # noqa: F401
    get_base_domain,
    is_external_url,
    normalize_url,
    normalize_url_for_deep_crawl,
    normalize_url_udf,
    normalize_deep_udf,
)
from crawl4ai_spark.functions.urls import (  # noqa: F401
    host_col,
    base_domain_col,
    path_col,
    path_depth_col,
    extension_col,
    url_valid_col,
)
