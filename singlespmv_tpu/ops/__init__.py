from .segsum import (combine_partials, extract_run_partials,
                     segment_sum_sorted, segmented_scan_inclusive)

__all__ = [
    "combine_partials", "extract_run_partials",
    "segment_sum_sorted", "segmented_scan_inclusive",
]
