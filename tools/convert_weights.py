#!/usr/bin/env python
"""Convert keras.applications pretrained weights to the wicca_tpu zoo format.

Usage:
  # from a pre-downloaded Keras H5 weights file (no TF needed):
  python tools/convert_weights.py ResNet50 resnet50_imagenet.h5 /path/to/WICCA_TPU_WEIGHTS

  # download + convert (requires tensorflow + network):
  python tools/convert_weights.py EfficientNetB0 --fetch /path/to/WICCA_TPU_WEIGHTS

Then point the registry at the output directory:
  export WICCA_TPU_WEIGHTS=/path/to/WICCA_TPU_WEIGHTS

Parity check: tests/test_convert_weights.py::test_activation_parity_fixture
compares converted-model logits against stored Keras logits when a fixture
npz is present (WICCA_TPU_PARITY_FIXTURES); build one with
tools/make_parity_fixture.py on a machine that has TF.
"""

from __future__ import annotations

import argparse
import logging
import sys
import tempfile

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

from wicca_tpu.models.convert import convert_h5, convertible_architectures, fetch_keras_weights


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    ap = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("arch", choices=convertible_architectures())
    ap.add_argument("h5", nargs="?", default=None, help="pre-downloaded Keras .h5 weights file")
    ap.add_argument("out_dir", help="output dir (becomes WICCA_TPU_WEIGHTS)")
    ap.add_argument("--fetch", action="store_true", help="download via tensorflow instead of using a local .h5")
    args = ap.parse_args(argv)
    if args.fetch:
        with tempfile.TemporaryDirectory() as td:
            h5 = fetch_keras_weights(args.arch, td)
            out = convert_h5(args.arch, h5, args.out_dir)
    elif args.h5 is None:
        ap.error("pass a .h5 file or --fetch")
    else:
        out = convert_h5(args.arch, args.h5, args.out_dir)
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
