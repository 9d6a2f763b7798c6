"""Docs stay consistent with the canonical perf records.

Round-3 review finding: headline numbers lived in four places
(README/BASELINE/PERFORMANCE/SERVING) and one was stale at any given
time (docs/SERVING.md quoted a superseded B=48 number for a full
round). docs/RECORDS.json is now the single source of truth; this suite
fails when a user-facing doc drifts from it or resurrects a superseded
number outside its allowed history sections.
"""

import json
import os
import re

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _records():
    with open(os.path.join(ROOT, "docs", "RECORDS.json")) as f:
        return json.load(f)


def _read(relpath):
    with open(os.path.join(ROOT, relpath)) as f:
        return f.read()


def test_quotes_match_records():
    data = _records()
    problems = []
    for rec in data["records"]:
        for q in rec["quotes"]:
            text = _read(q["file"])
            m = re.search(q["where"], text)
            if m is None:
                problems.append(
                    f"{rec['name']}: pattern {q['where']!r} not found in {q['file']}"
                )
            elif m.group(1) != q["text"]:
                problems.append(
                    f"{rec['name']}: {q['file']} quotes {m.group(1)} where "
                    f"RECORDS.json pins {q['text']} (canonical {rec['value']})"
                )
    assert not problems, "\n".join(problems)


USER_FACING = ["README.md", "docs/SERVING.md", "docs/PERFORMANCE.md", "docs/SCALING.md"]


def test_superseded_numbers_do_not_resurface():
    data = _records()
    problems = []
    for old in data.get("superseded", []):
        for rel in USER_FACING:
            if rel in old.get("allowed_files", []):
                continue
            if old["value"] in _read(rel):
                problems.append(
                    f"superseded number {old['value']!r} ({old['reason']}) "
                    f"appears in {rel}"
                )
    assert not problems, "\n".join(problems)


def test_record_files_exist():
    data = _records()
    for rec in data["records"]:
        for q in rec["quotes"]:
            assert os.path.exists(os.path.join(ROOT, q["file"])), q["file"]
