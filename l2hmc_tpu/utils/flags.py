"""Argfile-aware argument parsing shared by every CLI.

The reference supports ``@argfile`` indirection with shell-style quoting
and ``#`` comments (``gauge_model.py:2430-2434`` re-parses the file
through ``shlex.split(..., comments=True)``; its canonical
``gauge_model_args.txt`` is mostly comment banner).  Here the same
behavior lives in ``convert_arg_line_to_args`` so @files compose with
regular CLI flags and with each other::

    python cli/train_gauge.py @configs/gauge_8x8.txt --train_steps 100

Argfile format: one or more tokens per line (``--flag value`` or the
flag and value on separate lines both work), blank lines and ``#``
comments ignored.
"""

from __future__ import annotations

import argparse
import shlex


class ArgfileParser(argparse.ArgumentParser):
    def __init__(self, *args, **kwargs):
        kwargs.setdefault("fromfile_prefix_chars", "@")
        kwargs.setdefault(
            "formatter_class", argparse.ArgumentDefaultsHelpFormatter
        )
        super().__init__(*args, **kwargs)

    def convert_arg_line_to_args(self, arg_line: str):
        return shlex.split(arg_line, comments=True)
