"""Test-only stand-in for `orjson` backed by stdlib json, for importing the
read-only reference package in parity tests.

Matches the orjson behaviors the reference relies on: compact separators
(no spaces), bytes output, OPT_APPEND_NEWLINE, OPT_INDENT_2, native
dataclass serialization, and a `default=` fallback hook. Fidelity detail
the Metadata content hash depends on (reference shards.py:127-135): orjson
serializes DATACLASSES in field-definition order even under OPT_SORT_KEYS
(the option only sorts plain dicts), so dataclasses are pre-converted to
field-order dicts here and exempted from sorting.
"""

import dataclasses
import enum
import json as _json

OPT_APPEND_NEWLINE = 1 << 0
OPT_INDENT_2 = 1 << 1
OPT_SERIALIZE_NUMPY = 1 << 2
OPT_SORT_KEYS = 1 << 3


class _FieldOrder(dict):
    """Marker: a dataclass rendering whose key order must survive sorting."""


def _convert(obj, default):
    if isinstance(obj, enum.Enum):
        # orjson serializes enum members by VALUE natively.
        return _convert(obj.value, default)
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return _FieldOrder(
            (f.name, _convert(getattr(obj, f.name), default))
            for f in dataclasses.fields(obj)
        )
    if isinstance(obj, dict):
        return {k: _convert(v, default) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_convert(v, default) for v in obj]
    return obj


def dumps(obj, option=None, default=None):
    def _default(o):
        if isinstance(o, _FieldOrder):
            return dict(o)
        if default is not None:
            converted = default(o)
            return _convert(converted, default)
        raise TypeError(o)

    obj = _convert(obj, default)
    sort = bool(option and option & OPT_SORT_KEYS)

    def render(o):
        # Manual renderer so _FieldOrder dicts keep their order even when
        # sort_keys is requested for plain dicts. Strings render as raw UTF-8
        # (ensure_ascii=False), matching orjson's byte output — the Metadata
        # content hash flows through these bytes.
        if isinstance(o, _FieldOrder):
            items = list(o.items())
        elif isinstance(o, dict):
            items = sorted(o.items()) if sort else list(o.items())
        else:
            items = None
        if items is not None:
            for k, _ in items:
                if not isinstance(k, str):
                    # Real orjson raises without OPT_NON_STR_KEYS.
                    raise TypeError(f"Dict key must be str, got {type(k).__name__}")
            inner = ",".join(
                f"{_json.dumps(k, ensure_ascii=False)}:{render(v)}"
                for k, v in items
            )
            return "{" + inner + "}"
        if isinstance(o, list):
            return "[" + ",".join(render(v) for v in o) + "]"
        try:
            return _json.dumps(o, separators=(",", ":"), ensure_ascii=False)
        except TypeError:
            return render(_default(o))

    if option and option & OPT_INDENT_2:
        # orjson applies OPT_SORT_KEYS under OPT_INDENT_2 too (still only to
        # plain dicts; _FieldOrder survives via its dict rendering order —
        # stdlib sort_keys would break that, so pre-sort plain dicts instead).
        def presort(o):
            if isinstance(o, _FieldOrder):
                return _FieldOrder((k, presort(v)) for k, v in o.items())
            if isinstance(o, dict):
                items = sorted(o.items()) if sort else o.items()
                return {k: presort(v) for k, v in items}
            if isinstance(o, list):
                return [presort(v) for v in o]
            return o

        out = _json.dumps(
            presort(obj), indent=2, default=_default,
            sort_keys=False, ensure_ascii=False,
        ).encode()
    else:
        out = render(obj).encode()
    if option and option & OPT_APPEND_NEWLINE:
        out += b"\n"
    return out


def loads(data):
    return _json.loads(data)
