#!/usr/bin/env python
"""Landmark training entry point (reference-parity CLI).

Equivalent of /root/reference/examples/train_ldmks.py; see
tpu_mednet/cli/train_ldmks.py for the implementation.
"""
import sys

from tpu_mednet.cli.train_ldmks import main

if __name__ == "__main__":
    sys.exit(main())
