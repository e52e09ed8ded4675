#!/usr/bin/env python
"""Segmentation training entry point (reference-parity CLI).

Equivalent of /root/reference/examples/train_seg.py; see
tpu_mednet/cli/train_seg.py for the implementation.
"""
import sys

from tpu_mednet.cli.train_seg import main

if __name__ == "__main__":
    sys.exit(main())
