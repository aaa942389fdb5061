"""Small cross-cutting utilities (ref: src/util/misc.py)."""

from __future__ import annotations

import json
import logging


class EasyDict(dict):
    """Attribute-access dict (ref: src/util/misc.py:8-65)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e


def log_opts(opt) -> None:
    """Dump parsed CLI options as JSON (ref: src/util/misc.py:67-69)."""
    try:
        payload = json.dumps(vars(opt), indent=2, default=str)
    except TypeError:
        payload = str(opt)
    logging.info("Options:\n%s", payload)
