"""Tolerant JSON extraction from model-style text output.

Same three-stage recovery semantics as the reference
(``cv_api/resume_schema.py:134-184``; duplicate at
``pages/llm_parsing_benchmark.py:258-291``): direct parse, fenced
```` ```json ````/``` ``` ``` block scan, then first-``{``-to-balanced-``}``
brace match; the result must be a JSON object.
"""

from __future__ import annotations

import json


def recover_json(text: str | None) -> tuple[dict | None, str | None]:
    """Return ``(parsed_object, error)``; exactly one side is None."""
    if not (text and text.strip()):
        return None, "Empty response"
    text = text.strip()

    try:
        parsed = json.loads(text)
        if isinstance(parsed, dict):
            return parsed, None
        return None, "JSON response is not an object"
    except json.JSONDecodeError:
        pass

    for fence in ("```json", "```"):
        if fence in text:
            start = text.find(fence) + len(fence)
            end = text.find("```", start)
            if end != -1:
                try:
                    parsed = json.loads(text[start:end].strip())
                    if isinstance(parsed, dict):
                        return parsed, None
                    return None, "JSON response is not an object"
                except json.JSONDecodeError:
                    pass

    start = text.find("{")
    if start != -1:
        depth = 0
        for i in range(start, len(text)):
            ch = text[i]
            if ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
                if depth == 0:
                    try:
                        parsed = json.loads(text[start : i + 1])
                        if isinstance(parsed, dict):
                            return parsed, None
                        return None, "JSON response is not an object"
                    except json.JSONDecodeError:
                        break
    return None, "No valid JSON found in response"


def recover_json_str(text: str | None) -> str | None:
    """String-in/string-out variant for the vectorized pre-pass feeding
    Spark ``from_json`` (canonical compact re-serialization)."""
    parsed, _ = recover_json(text)
    if parsed is None:
        return None
    return json.dumps(parsed, ensure_ascii=False, separators=(",", ":"), sort_keys=True)


def flatten_leaves(obj, path: str = "") -> list[tuple[str, object]]:
    """Flatten nested JSON to (path, leaf) pairs with ``a.b[i].c`` paths
    (``pages/llm_parsing_benchmark.py:317-328`` semantics)."""
    out: list[tuple[str, object]] = []
    if isinstance(obj, dict):
        for k, v in obj.items():
            out.extend(flatten_leaves(v, f"{path}.{k}" if path else k))
    elif isinstance(obj, list):
        for i, v in enumerate(obj):
            out.extend(flatten_leaves(v, f"{path}[{i}]"))
    else:
        out.append((path, obj))
    return out


def normalize_leaf(v) -> str:
    """None -> '', bool -> 'true'/'false', else lowercased stripped str
    (``pages/llm_parsing_benchmark.py:331-336``)."""
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v).strip().lower()


def leaf_accuracy(predicted: dict | None, ground_truth: dict | None) -> float:
    """% of golden leaf paths whose normalized value matches the
    prediction at the same path; 100.0 for leafless golden
    (``pages/llm_parsing_benchmark.py:339-350``)."""
    gt_leaves = flatten_leaves(ground_truth if ground_truth is not None else {})
    if not gt_leaves:
        return 100.0
    pred_flat = dict(flatten_leaves(predicted if predicted is not None else {}))
    matches = sum(
        1
        for path, gt_val in gt_leaves
        if normalize_leaf(pred_flat.get(path)) == normalize_leaf(gt_val)
    )
    return 100.0 * matches / len(gt_leaves)
