"""Vendor the reference repo's golden redaction fixtures as JSON data.

Parses ``/root/reference/examples.py`` (public untrusted content) with the
``ast`` module — no reference code is imported or executed; only the literal
``text`` / ``entities`` / ``redacted_text`` fields of each ``dspy.Example``
call and the ``FEWSHOT_ROW_IDS`` set are extracted as *data*
(reference: examples.py:5-31, 33-418).

Also vendors the 8 offline scenario inputs from the reference's integration
test descriptions (tests/integration/test_redact.py:9-54) and the label
vocabulary (tests/unit/test_examples.py:5-33).

Output: fixtures/golden_examples.json  (run from the repo root).
"""

from __future__ import annotations

import ast
import json
from pathlib import Path

REFERENCE = Path("/root/reference/examples.py")
OUT = Path(__file__).resolve().parent.parent / "fixtures" / "golden_examples.json"

VALID_LABELS = [
    "GIVENNAME1", "GIVENNAME2", "LASTNAME1", "LASTNAME2", "LASTNAME3",
    "TITLE", "TEL", "EMAIL", "USERNAME", "SOCIALNUMBER", "IDCARD",
    "DRIVERLICENSE", "PASSPORT", "STREET", "BUILDING", "CITY", "STATE",
    "POSTCODE", "COUNTRY", "SECADDRESS", "GEOCOORD", "SEX", "BOD", "PASS",
    "IP", "DATE", "TIME",
]

# Offline scenario inputs mirroring the reference's live-LLM integration
# scenarios (tests/integration/test_redact.py:9-54).
SCENARIOS = [
    {"url": "fixture://scenario/1", "text": "Call John Smith at 555-123-4567"},
    {"url": "fixture://scenario/2", "text": "Email me at alice@example.com"},
    {"url": "fixture://scenario/3", "text": "My SSN is 123-45-6789"},
    {"url": "fixture://scenario/4",
     "text": "I live at 42 Oak Street, Portland, OR 97201"},
    {"url": "fixture://scenario/5", "text": "The weather is nice today."},
    {"url": "fixture://scenario/6",
     "text": "Alice Brown met Bob Davis at the cafe."},
    {"url": "fixture://scenario/7", "text": "Server at 10.0.0.1 is down"},
    {"url": "fixture://scenario/8", "text": "Hi there"},
]


def _literal(node: ast.AST):
    return ast.literal_eval(node)


def main() -> None:
    tree = ast.parse(REFERENCE.read_text())
    fewshot_ids: list[str] = []
    examples: list[dict] = []

    for node in ast.walk(tree):
        if isinstance(node, ast.AnnAssign) and getattr(node.target, "id", "") == "FEWSHOT_ROW_IDS":
            fewshot_ids = sorted(_literal(node.value))
        if isinstance(node, ast.Call):
            func = node.func
            # dspy.Example(...) calls
            if isinstance(func, ast.Attribute) and func.attr == "Example":
                kw = {k.arg: _literal(k.value) for k in node.keywords}
                if {"text", "entities", "redacted_text"} <= kw.keys():
                    examples.append(kw)

    assert len(examples) == 25, f"expected 25 examples, got {len(examples)}"
    assert len(fewshot_ids) == 25, f"expected 25 fewshot ids, got {len(fewshot_ids)}"

    rows = []
    for i, (ex, row_id) in enumerate(zip(examples, fewshot_ids), start=1):
        rows.append({
            "url": f"fixture://ai4privacy/{i}",
            "row_id": row_id,
            "text": ex["text"],
            "entities": ex["entities"],
            "redacted_text_gold": ex["redacted_text"],
        })

    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps({
        "labels": VALID_LABELS,
        "golden": rows,
        "scenarios": SCENARIOS,
    }, ensure_ascii=False, indent=1))
    print(f"wrote {OUT} ({len(rows)} golden, {len(SCENARIOS)} scenarios)")


if __name__ == "__main__":
    main()
