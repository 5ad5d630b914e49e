from crawl4ai_spark.plans.extract import extract_pages, scrape_udf, markdown_udf  # noqa: F401
