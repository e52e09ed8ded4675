"""Misc helpers (log-level parsing).

Reference: `/root/reference/midasmednet/utils/misc.py:10-18` — whose
``_log_level_string_to_int`` was truncated and never returned (SURVEY.md
§2.4); this one does.
"""

from __future__ import annotations

import argparse
import logging

LOG_LEVEL_STRINGS = ["CRITICAL", "ERROR", "WARNING", "INFO", "DEBUG"]


def log_level_string_to_int(log_level_string: str) -> int:
    value = log_level_string.upper()
    if value not in LOG_LEVEL_STRINGS:
        raise argparse.ArgumentTypeError(
            f"invalid choice: {log_level_string} (choose from {LOG_LEVEL_STRINGS})"
        )
    level = getattr(logging, value)
    assert isinstance(level, int)
    return level


# reference-compatible aliases
_LOG_LEVEL_STRINGS = LOG_LEVEL_STRINGS
_log_level_string_to_int = log_level_string_to_int
