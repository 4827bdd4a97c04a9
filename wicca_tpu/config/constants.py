"""Shared constant strings and paths.

Parity surface: mirrors the reference's config module
(/root/reference/wicca/config/constants.py:1-18) so that downstream CSV
consumers see identical dict keys and column names. Clean-room: the strings
below are part of the public CSV/file contract documented in SURVEY.md §2.1
(C6, C12) and must not change.
"""

from pathlib import Path

PROJECT_ROOT = Path(__file__).resolve().parent.parent.parent
RESULTS_FOLDER = PROJECT_ROOT / "results"

# Classifier-dict keys (SURVEY.md C12; reference constants.py:6-11)
MODEL = "model"
PRE_INP = "preprocess_input"
DEC_PRED = "decode_predictions"
SHAPE = "shape"
ICON = "icon"
SOURCE = "source"

# CSV column names (reference constants.py:13-16). These exact strings are the
# cross-framework results contract.
FILE = "file"
SIM_CLASSES = "similar classes (count)"
SIM_CLASSES_PERC = "similar classes (%)"
SIM_BEST_CLASS = "similar best class"

MAX_INFO_SAMPLE_SIZE = 50
