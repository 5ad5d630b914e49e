from crawl4ai_spark.html.parser import Node, parse_html  # noqa: F401
from crawl4ai_spark.html.scrape import scrape_page  # noqa: F401
from crawl4ai_spark.html.markdown import html_to_markdown, links_to_citations  # noqa: F401
from crawl4ai_spark.html.pruning import prune_fit_html  # noqa: F401
