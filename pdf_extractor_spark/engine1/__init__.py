from .pipeline import (  # noqa: F401
    attention_table,
    classify_pages,
    explode_pages,
    extract_folha,
    matched_lines,
    page_metrics,
)
from .rules import rules_df  # noqa: F401
