"""Clean-room guard: no string literal of meaningful length may be shared
verbatim with the GPL reference, outside the documented cross-framework
contract (SURVEY.md C12: CSV column names, result-dict keys, file-layout
templates). VERDICT r2 found copied error/log strings that the mechanical
copy detector missed; this test makes that class of regression fail loudly.

Skips when the reference checkout is absent (production installs do not
ship it).
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest

REFERENCE = Path("/root/reference/wicca")
REPO_PKG = Path(__file__).resolve().parent.parent / "wicca_tpu"

# The documented contract surface (SURVEY.md C6/C12): identical strings here
# are the point — they are what makes CSVs/result dicts interchangeable
# between the reference and this framework.
CONTRACT_STRINGS = {
    # config/constants.py dict keys + CSV column names
    "preprocess_input",
    "decode_predictions",
    "similar classes (count)",
    "similar classes (%)",
    "similar best class",
    # CSV file-layout templates (results/depth-{d}/{name}[-summary]-depth-{d}.csv)
    "depth-{depth}",
    "{classifier_name}-depth-{depth}.csv",
    "{classifier_name}-summary-depth-{depth}.csv",
    # plot_compare_metrics default axis/title labels: part of the
    # reference's positional-call API surface (visualization.py:256-259) —
    # a drop-in caller relying on defaults must see the same labels
    "Similar classes, %",
    "Best class similarity, %",
    "Classifier Performance Comparison",
}

MIN_LEN = 12  # below this, collisions are coincidental ("import numpy"...)

_STRING_RE = re.compile(r'["\']([^"\'\n]{%d,})["\']' % MIN_LEN)


def _literals(path: Path) -> set[str]:
    out: set[str] = set()
    for py in path.rglob("*.py"):
        out.update(m.group(1) for m in _STRING_RE.finditer(py.read_text()))
    return out


@pytest.mark.skipif(not REFERENCE.is_dir(), reason="reference checkout not present")
def test_no_verbatim_reference_strings_outside_contract():
    ref = _literals(REFERENCE)
    leaks = []
    for py in REPO_PKG.rglob("*.py"):
        src = py.read_text()
        for m in _STRING_RE.finditer(src):
            s = m.group(1)
            if s in ref and s not in CONTRACT_STRINGS:
                leaks.append(f"{py.relative_to(REPO_PKG.parent)}:{src[:m.start()].count(chr(10)) + 1}: {s!r}")
    assert not leaks, "string literals shared verbatim with the GPL reference:\n" + "\n".join(leaks)
