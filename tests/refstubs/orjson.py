"""Test-only stand-in for `orjson` backed by stdlib json, for importing the
read-only reference package in parity tests.

Matches the orjson behaviors the reference relies on: compact separators
(no spaces), bytes output, OPT_APPEND_NEWLINE, OPT_INDENT_2, native
dataclass serialization, and a `default=` fallback hook.
"""

import dataclasses
import json as _json

OPT_APPEND_NEWLINE = 1 << 0
OPT_INDENT_2 = 1 << 1
OPT_SERIALIZE_NUMPY = 1 << 2
OPT_SORT_KEYS = 1 << 3


def dumps(obj, option=None, default=None):
    def _default(o):
        if dataclasses.is_dataclass(o) and not isinstance(o, type):
            return dataclasses.asdict(o)
        if default is not None:
            return default(o)
        raise TypeError(o)

    kwargs = {"separators": (",", ":"), "default": _default}
    if option:
        if option & OPT_INDENT_2:
            kwargs = {"indent": 2, "default": _default}
        if option & OPT_SORT_KEYS:
            kwargs["sort_keys"] = True
    out = _json.dumps(obj, **kwargs).encode()
    if option and option & OPT_APPEND_NEWLINE:
        out += b"\n"
    return out


def loads(data):
    return _json.loads(data)
