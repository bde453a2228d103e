"""Typed-dataclass config + sweep engine.

Sweeps are Python files exporting `make_cfgs() -> list[dict]`; each dict may hold
list values that are expanded via cartesian product. CLI overrides beat sweep values,
and seeds auto-increment per expanded config. Semantics mirror the reference's
`src/saev/configs.py:17-311` (its test_configs.py defines the contract).
"""

import dataclasses
import itertools
import logging
import pathlib
import types
import typing as tp
from collections.abc import Iterator

T = tp.TypeVar("T")

logger = logging.getLogger(__name__)


def load_sweep(sweep_fpath: pathlib.Path) -> list[dict]:
    """Load a sweep file and return the list of config dicts.

    Args:
        sweep_fpath: Path to a Python file with a `make_cfgs()` function.

    Returns:
        List of config dictionaries from `make_cfgs()`. Empty list on any error.
    """
    try:
        namespace: dict[str, object] = {}
        exec(sweep_fpath.read_text(), namespace)
        result = namespace["make_cfgs"]()
        if not isinstance(result, list):
            logger.warning(
                "make_cfgs() in %s returned %s, expected list",
                sweep_fpath,
                type(result).__name__,
            )
            return []
        return result
    except Exception as err:
        logger.warning("Failed to load sweep from %s: %s", sweep_fpath, err)
        return []


def expand(config: dict[str, object]) -> Iterator[dict[str, object]]:
    """Expand a nested dict that may contain lists into many dicts."""
    yield from _expand_discrete(dict(config))


def _expand_discrete(config: dict[str, object]) -> Iterator[dict[str, object]]:
    if not config:
        yield {}
        return

    key, value = config.popitem()

    if isinstance(value, list):
        for c in _expand_discrete(config):
            for v in value:
                yield {**c, key: v}
    elif isinstance(value, dict):
        for c, v in itertools.product(
            _expand_discrete(config), _expand_discrete(dict(value))
        ):
            yield {**c, key: v}
    else:
        for c in _expand_discrete(config):
            yield {**c, key: value}


def load_cfgs(
    override: T, *, default: T, sweep_dcts: list[dict]
) -> tuple[list[T], list[str]]:
    """Build configs by merging CLI overrides > sweep values > defaults.

    Args:
        override: Command-line overridden config instance.
        default: The default config instance.
        sweep_dcts: Expanded sweep dicts (list values already expanded by caller or not;
            caller typically runs `expand` per dict before this).

    Returns:
        (configs, errors).
    """
    assert dataclasses.is_dataclass(override) and not isinstance(override, type)
    assert dataclasses.is_dataclass(default) and not isinstance(default, type)

    if not sweep_dcts:
        return [override], []

    overridden_fields = get_non_default_values(override, default)

    cfgs: list[T] = []
    errs: list[str] = []
    d = 0  # global counter for seed incrementing across all expanded configs

    for sweep_dct in sweep_dcts:
        filtered_dct = _filter_overridden_fields(sweep_dct, overridden_fields)

        if not filtered_dct:
            cfgs.append(override)
            d += 1
            continue

        try:
            updates = _recursive_dataclass_update(override, filtered_dct, override, d)
            if hasattr(override, "seed") and "seed" not in updates:
                updates["seed"] = getattr(override, "seed", 0) + d
            cfgs.append(dataclasses.replace(override, **updates))
            d += 1
        except Exception as err:
            errs.append(str(err))
            d += 1

    return cfgs, errs


def _filter_overridden_fields(
    dct: dict[str, object], overridden: dict[str, object]
) -> dict[str, object]:
    """Remove fields from `dct` that were explicitly overridden on the CLI."""
    result: dict[str, object] = {}
    for key, value in dct.items():
        if key not in overridden:
            result[key] = value
            continue

        if isinstance(value, dict):
            overridden_value = overridden.get(key)

            if isinstance(overridden_value, dict):
                filtered = _filter_overridden_fields(value, overridden_value)
                if filtered:
                    result[key] = filtered
                continue

            if dataclasses.is_dataclass(overridden_value) and not isinstance(
                overridden_value, type
            ):
                try:
                    default_value = type(overridden_value)()
                except TypeError:
                    # Cannot construct a default to diff against; treat as overridden.
                    continue
                nested_overrides = get_non_default_values(
                    overridden_value, default_value
                )
                filtered = _filter_overridden_fields(value, nested_overrides)
                if filtered:
                    result[key] = filtered
                continue

            # Scalar override wins over a dict sweep value.
            continue
        # Non-dict value on an overridden field: drop it (override wins).
    return result


def _convert_value(value: object, field_type: object) -> object:
    """Coerce a sweep/JSON value to the declared field type."""
    origin = tp.get_origin(field_type)
    args = tp.get_args(field_type)

    if origin is tuple and args:
        return tuple(value) if isinstance(value, list) else value
    elif origin is list and args and dataclasses.is_dataclass(args[0]):
        return [dict_to_dataclass(item, args[0]) for item in value]
    elif dataclasses.is_dataclass(field_type):
        return dict_to_dataclass(value, field_type)
    elif field_type is pathlib.Path:
        return pathlib.Path(value) if value is not None else value
    elif origin is tp.Union and pathlib.Path in args:
        return pathlib.Path(value) if value is not None else value
    elif origin is types.UnionType and pathlib.Path in args:
        return pathlib.Path(value) if value is not None else value
    else:
        if isinstance(field_type, type) and not isinstance(value, field_type):
            raise TypeError(
                f"Expected {field_type.__name__}, got {type(value).__name__}"
            )
        return value


def _resolve_field_type(cls: type, name: str) -> object:
    """Resolve a dataclass field's type, handling string annotations."""
    field_type = cls.__dataclass_fields__[name].type
    if isinstance(field_type, str):
        hints = tp.get_type_hints(cls)
        field_type = hints.get(name, field_type)
    return field_type


def _recursive_dataclass_update(obj, updates: dict[str, object], base_cfg, d: int):
    """Recursively compute `dataclasses.replace` kwargs for nested dataclasses."""
    if not dataclasses.is_dataclass(obj):
        return updates

    result: dict[str, object] = {}
    for key, value in updates.items():
        if not hasattr(obj, key):
            result[key] = value
            continue

        attr = getattr(obj, key)
        field_type = _resolve_field_type(type(obj), key)

        if dataclasses.is_dataclass(attr) and isinstance(value, dict):
            nested_updates = _recursive_dataclass_update(attr, value, base_cfg, d)
            if hasattr(attr, "seed") and "seed" not in nested_updates:
                base_seed = getattr(base_cfg, "seed", 0) if base_cfg else 0
                nested_updates["seed"] = getattr(attr, "seed", 0) + base_seed + d
            result[key] = dataclasses.replace(attr, **nested_updates)
        else:
            result[key] = _convert_value(value, field_type)

    return result


def dict_to_dataclass(data: dict, cls: type[T]) -> T:
    """Recursively convert a dictionary to a dataclass instance."""
    if not dataclasses.is_dataclass(cls):
        return data  # type: ignore[return-value]

    kwargs: dict[str, object] = {}
    for field in dataclasses.fields(cls):
        if field.name not in data:
            continue
        value = data[field.name]
        field_type = _resolve_field_type(cls, field.name)

        origin = tp.get_origin(field_type)
        args = tp.get_args(field_type)

        if origin is tuple and args:
            kwargs[field.name] = tuple(value) if isinstance(value, list) else value
        elif origin is list and args and dataclasses.is_dataclass(args[0]):
            kwargs[field.name] = [dict_to_dataclass(item, args[0]) for item in value]
        elif dataclasses.is_dataclass(field_type):
            kwargs[field.name] = dict_to_dataclass(value, field_type)
        elif field_type is pathlib.Path:
            kwargs[field.name] = pathlib.Path(value) if value is not None else value
        elif origin is tp.Union and pathlib.Path in args:
            kwargs[field.name] = pathlib.Path(value) if value is not None else value
        elif origin is types.UnionType and pathlib.Path in args:
            kwargs[field.name] = pathlib.Path(value) if value is not None else value
        else:
            kwargs[field.name] = value

    return cls(**kwargs)


def get_non_default_values(obj: T, default_obj: T) -> dict:
    """Recursively find fields that differ from defaults."""
    assert dataclasses.is_dataclass(obj) and not isinstance(obj, type)
    assert dataclasses.is_dataclass(default_obj) and not isinstance(default_obj, type)

    diff: dict[str, object] = {}
    for field in dataclasses.fields(obj):
        obj_value = getattr(obj, field.name)
        default_value = getattr(default_obj, field.name)

        if obj_value == default_value:
            continue

        if (
            dataclasses.is_dataclass(obj_value)
            and dataclasses.is_dataclass(default_value)
            and type(obj_value) is type(default_value)
        ):
            nested_diff = get_non_default_values(obj_value, default_value)
            if nested_diff:
                diff[field.name] = nested_diff
        else:
            diff[field.name] = obj_value

    return diff
