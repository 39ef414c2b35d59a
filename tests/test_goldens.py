"""Golden-artifact tests against the reference's provided submission JSONs.

The reference ships 4 byte-reproducible CIRR test1 submission files
(/root/reference/submission/CIRR/recall_*_stage{1,2}_0.json, documented
"identical to our provided files" at Instructions_CIRR.md:164). These tests
assert our writer (retrieval/submission.py) produces byte-identical output
when fed the goldens' own content, i.e. schema + key-ordering + separator
parity with the reference writer (cirr_test_submission.py:49-71).
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

from candidate_reranking_cir_tpu.retrieval.submission import (
    build_submissions,
    write_submissions,
)

GOLDEN_DIR = Path("/root/reference/submission/CIRR")

pytestmark = pytest.mark.skipif(
    not GOLDEN_DIR.exists(), reason="reference goldens not present"
)


def _load_golden(stage: int):
    sub = json.loads(
        (GOLDEN_DIR / f"recall_submission_stage{stage}_0.json").read_text())
    grp = json.loads(
        (GOLDEN_DIR / f"recall_subset_submission_stage{stage}_0.json").read_text())
    return sub, grp


@pytest.mark.parametrize("stage", [1, 2])
def test_golden_schema(stage):
    sub, grp = _load_golden(stage)
    for d, metric in ((sub, "recall"), (grp, "recall_subset")):
        assert d.pop("version") == "rc2"
        assert d.pop("metric") == metric
    assert len(sub) == 4148 and len(grp) == 4148
    assert set(sub) == set(grp)
    for pid, names in sub.items():
        int(pid)  # pair ids are stringified ints
        assert len(names) == 50
        break
    for pid, names in grp.items():
        assert len(names) == 3
        break


@pytest.mark.parametrize("stage", [1, 2])
def test_writer_byte_identical_roundtrip(stage, tmp_path):
    """Feed the goldens' own rankings through build/write_submissions and
    byte-diff the output against the golden files."""
    sub, grp = _load_golden(stage)
    pair_ids = [k for k in sub if k not in ("version", "metric")]
    sorted_names = np.array([sub[p] for p in pair_ids], dtype=object)
    group_names = np.array([grp[p] for p in pair_ids], dtype=object)

    submission, group_submission = build_submissions(
        [int(p) for p in pair_ids], sorted_names, group_names)
    p1, p2 = write_submissions(tmp_path, f"golden_stage{stage}",
                               submission, group_submission)

    golden1 = (GOLDEN_DIR / f"recall_submission_stage{stage}_0.json").read_bytes()
    golden2 = (GOLDEN_DIR
               / f"recall_subset_submission_stage{stage}_0.json").read_bytes()
    assert p1.read_bytes() == golden1
    assert p2.read_bytes() == golden2
