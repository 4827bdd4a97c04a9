"""Reference module shim: wicca.result_manager."""

from wicca_tpu.analysis.results import (  # noqa: F401
    ResultPaths,
    compare_summaries,
    extract_from_comparison,
    extract_item_from_preds,
    get_short_comparison,
    load_summary_results,
)
