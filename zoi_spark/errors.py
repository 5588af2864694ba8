"""Error contract — codes, message templates, rendering, treefy/prettify.

Re-expresses the error semantics of the reference validator (Zoi,
``lib/zoi/error.ex``): 16 fixed codes (``lib/zoi/error.ex:15-31``),
``%{var}`` template interpolation (``lib/zoi/error.ex:140-167``),
message wording that varies by type *category* — string counts
"character(s)", arrays count "item(s)", numbers/dates compare plainly
(``lib/zoi/error.ex:687-689``) — and path-carrying errors that can be
tree-ified or pretty-printed (``lib/zoi.ex:452-521``).

Because every constraint parameter is known at schema-compile time, all
messages here render to *constant strings on the driver*; executors only
ever attach pre-rendered literals, never format strings per row.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping, Sequence

# The 16 fixed error codes (lib/zoi/error.ex:15-31).
CODES = frozenset(
    {
        "invalid_type",
        "invalid_literal",
        "invalid_tuple",
        "unrecognized_key",
        "invalid_enum_value",
        "not_in_values",
        "required",
        "less_than",
        "greater_than",
        "less_than_or_equal_to",
        "greater_than_or_equal_to",
        "invalid_length",
        "invalid_format",
        "multiple_of",
        "not_unique",
        "custom",
    }
)

# Type-category collapse (lib/zoi/error.ex:687-689).
_NUMBER_TYPES = {"integer", "float", "number", "decimal"}
_DATE_TYPES = {"date", "datetime", "naive_datetime", "time"}


# custom kinds (schema.register_kind) declare which message family
# their ordering/length checks phrase with — default "number"
_EXTRA_CATEGORIES: dict[str, str] = {}


def register_type_category(kind: str, category: str) -> None:
    _EXTRA_CATEGORIES[kind] = category


def unregister_type_category(kind: str) -> None:
    _EXTRA_CATEGORIES.pop(kind, None)


def type_category(type_name: str) -> str:
    if type_name in _NUMBER_TYPES:
        return "number"
    if type_name in _DATE_TYPES:
        return "date"
    return _EXTRA_CATEGORIES.get(type_name, type_name)  # string, array, ...


def render(template: str, variables: Mapping[str, Any]) -> str:
    """Interpolate ``%{var}`` placeholders (lib/zoi/error.ex:140-167).

    Lists join with ", "; everything else stringifies.
    """
    out = template
    for key, value in variables.items():
        if isinstance(value, (list, tuple)):
            rendered = ", ".join(_stringify(v) for v in value)
        else:
            rendered = _stringify(value)
        out = out.replace("%{" + key + "}", rendered)
    return out


def _stringify(v: Any) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v.is_integer():
        # Elixir prints 5.0 as "5.0"; keep Python's repr which matches.
        return repr(v)
    return str(v)


@dataclass(frozen=True)
class ErrorSpec:
    """A fully rendered, compile-time-constant error description.

    Mirrors ``%Zoi.Error{code, issue, message, path}`` with the path
    split into a static prefix (known at compile time) — dynamic array
    indices are appended by the runtime expression layer.
    """

    code: str
    message: str
    template: str
    variables: Mapping[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.code not in CODES:
            raise ValueError(f"unknown error code: {self.code}")


def _mk(code: str, template: str, variables: Mapping[str, Any] | None = None,
        error_override: str | None = None) -> ErrorSpec:
    variables = dict(variables or {})
    if error_override is not None:
        # `error:` option replaces the message and flips the code to
        # :custom (lib/zoi/error.ex:183-197).
        return ErrorSpec("custom", render(error_override, variables),
                         error_override, variables)
    return ErrorSpec(code, render(template, variables), template, variables)


# --- constructors mirroring lib/zoi/error.ex ------------------------------

def invalid_type(type_name: str, *, error: str | None = None,
                 issue: str | None = None) -> ErrorSpec:
    template = issue or f"invalid type: expected {type_name or 'nil'}"
    return _mk("invalid_type", template, {"type": type_name}, error)


def invalid_literal(expected: Any, *, error: str | None = None) -> ErrorSpec:
    return _mk("invalid_literal", "invalid literal: expected %{expected}",
               {"expected": expected}, error)


def invalid_enum_value(values: Sequence[Any], *, error: str | None = None) -> ErrorSpec:
    return _mk("invalid_enum_value",
               "invalid enum value: expected one of %{values}",
               {"values": list(values)}, error)


def not_in_values(values: Sequence[Any], *, error: str | None = None) -> ErrorSpec:
    return _mk("not_in_values", "invalid value: expected one of %{values}",
               {"values": list(values)}, error)


def invalid_tuple(expected_length: int, actual_length: int, *,
                  error: str | None = None) -> ErrorSpec:
    return _mk(
        "invalid_tuple",
        "invalid tuple: expected length %{expected_length}, got %{actual_length}",
        {"expected_length": expected_length, "actual_length": actual_length},
        error,
    )


def unrecognized_key(key: str) -> ErrorSpec:
    return _mk("unrecognized_key", "unrecognized key: %{key}", {"key": key})


def required(key: str) -> ErrorSpec:
    return _mk("required", "is required", {"key": key})


def greater_than_or_equal_to(type_name: str, minimum: Any, *,
                             error: str | None = None) -> ErrorSpec:
    templates = {
        "string": "too small: must have at least %{count} character(s)",
        "array": "too small: must have at least %{count} item(s)",
        "number": "too small: must be at least %{count}",
        "date": "too small: must be at least %{count}",
    }
    return _mk("greater_than_or_equal_to", templates[type_category(type_name)],
               {"type": type_name, "count": minimum}, error)


def less_than_or_equal_to(type_name: str, maximum: Any, *,
                          error: str | None = None) -> ErrorSpec:
    templates = {
        "string": "too big: must have at most %{count} character(s)",
        "array": "too big: must have at most %{count} item(s)",
        "number": "too big: must be at most %{count}",
        "date": "too big: must be at most %{count}",
    }
    return _mk("less_than_or_equal_to", templates[type_category(type_name)],
               {"type": type_name, "count": maximum}, error)


def greater_than(type_name: str, minimum: Any, *, error: str | None = None) -> ErrorSpec:
    return _mk("greater_than", "too small: must be greater than %{count}",
               {"type": type_name, "count": minimum}, error)


def less_than(type_name: str, maximum: Any, *, error: str | None = None) -> ErrorSpec:
    return _mk("less_than", "too big: must be less than %{count}",
               {"type": type_name, "count": maximum}, error)


def invalid_length(type_name: str, length: int, *, error: str | None = None) -> ErrorSpec:
    templates = {
        "string": "invalid length: must have %{count} character(s)",
        "array": "invalid length: must have %{count} item(s)",
    }
    return _mk("invalid_length", templates[type_category(type_name)],
               {"type": type_name, "count": length}, error)


def invalid_format(pattern: str | None, *, error: str | None = None,
                   internal_message: str | None = None) -> ErrorSpec:
    template = internal_message or "invalid format: must match pattern %{pattern}"
    return _mk("invalid_format", template, {"pattern": pattern}, error)


def invalid_starting_string(prefix: str, *, error: str | None = None) -> ErrorSpec:
    return _mk("invalid_format", "invalid format: must start with '%{value}'",
               {"value": prefix}, error)


def invalid_ending_string(suffix: str, *, error: str | None = None) -> ErrorSpec:
    return _mk("invalid_format", "invalid format: must end with '%{value}'",
               {"value": suffix}, error)


def invalid_url(*, error: str | None = None) -> ErrorSpec:
    return _mk("invalid_format", "invalid format: must be a valid URL", {}, error)


def multiple_of(value: Any, *, error: str | None = None) -> ErrorSpec:
    return _mk("multiple_of", "must be a multiple of %{value}", {"value": value}, error)


def not_unique(*, error: str | None = None) -> ErrorSpec:
    return _mk("not_unique", "must contain unique items", {}, error)


def custom_error(message: str, variables: Mapping[str, Any] | None = None) -> ErrorSpec:
    return _mk("custom", message, variables or {})


# --- violation row post-processing (lib/zoi.ex:452-521) -------------------

def treefy_errors(rows: Sequence[Mapping[str, Any]]) -> dict:
    """Nest flat violation rows ``{path: [...], message: str}`` into a
    map keyed by path segments; pathless errors go under ``__errors__``
    (mirrors ``Zoi.treefy_errors/1``, lib/zoi.ex:452-469)."""
    tree: dict = {}
    for row in rows:
        path = list(row.get("path") or [])
        node = tree
        if not path:
            node.setdefault("__errors__", []).append(row["message"])
            continue
        for seg in path[:-1]:
            node = node.setdefault(seg, {})
        leaf = node.setdefault(path[-1], {})
        leaf.setdefault("__errors__", []).append(row["message"])
    return tree


def prettify_errors(rows: Sequence[Mapping[str, Any]]) -> list[str]:
    """Render "message, at a.b[0]" lines (Zoi.prettify_errors/1,
    lib/zoi.ex:490-521)."""
    out = []
    for row in rows:
        path = list(row.get("path") or [])
        if not path:
            out.append(row["message"])
            continue
        rendered = ""
        for seg in path:
            seg_s = str(seg)
            if seg_s.lstrip("-").isdigit():
                rendered += f"[{seg_s}]"
            else:
                rendered += ("." if rendered else "") + seg_s
        out.append(f"{row['message']}, at {rendered}")
    return out
