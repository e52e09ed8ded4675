#!/usr/bin/env python
"""Sliding-window prediction entry point (reference-parity CLI).

Equivalent of /root/reference/examples/predict.py; see
tpu_mednet/cli/predict.py for the implementation.
"""
import sys

from tpu_mednet.cli.predict import main

if __name__ == "__main__":
    sys.exit(main())
