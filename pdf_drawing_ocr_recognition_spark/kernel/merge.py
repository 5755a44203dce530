"""Merge-fold kernel: per-document assembly of sub-image results.

Re-expresses the reference's merge aggregate
(``pdor/pdor_unit.py:270-283`` in Water-Run/pdf-drawing-ocr-recognition):

- input: sequence of ``(sub_idx, result_dict)`` in processing order
  (page-major, then sub_idx — ref loop :187/:197 and append :248)
- empty dicts are skipped                                        (ref :275-276)
- a dict that is exactly ``{'text': v}`` collapses to key ``sub_{idx}`` (ref :278-279)
- otherwise each ``k → sub_{idx}_{k}``                           (ref :280-282)
- there is NO page prefix, so when the same sub_idx appears on a later page the
  later value overwrites the earlier one — **last-wins** (verified behavior of
  plain dict assignment in the ref loop).  We reproduce this exactly: it is part
  of the byte-identity contract.
"""

from __future__ import annotations

from typing import Any, Iterable


def merge_fold(results: Iterable[tuple[int, dict[str, Any]]]) -> dict[str, Any]:
    """Fold ordered (sub_idx, dict) pairs into one flat result dict.

    The caller is responsible for supplying pairs in the canonical order
    (page_idx asc, then sub_idx asc); under Spark that order is recovered with
    explicit sort keys, never partition order (SURVEY.md §7 hard-part 2).
    """
    merged: dict[str, Any] = {}
    for sub_idx, result_dict in results:
        prefix = f"sub_{sub_idx}"
        if not result_dict:
            continue
        if len(result_dict) == 1 and "text" in result_dict:
            merged[prefix] = result_dict["text"]
        else:
            for key, value in result_dict.items():
                merged[f"{prefix}_{key}"] = value
    return merged
