"""zoi_spark — a PySpark-native schema + constraint validation engine.

Re-expresses the declarative schema DSL of phcurado/zoi (Elixir) as
compiled Spark SQL Column predicates and Arrow-vectorized batches over
Parquet/Iceberg tables of web documents. See SURVEY.md for the full
mapping and BASELINE.json for the target contract.

Typical use::

    import zoi_spark as z

    schema = z.fields({
        "url": z.url(),
        "text": z.string(min=1, max=20000),
        "lang": z.enum(["en", "de", "fr"]),
        "warc_ts": z.datetime(),
    })
    result = z.validate(df, schema, id_cols=["url"])
    result.violations.show()          # (url, rule_id, code, path, message)
    result.parsed                      # coerced/transformed output
"""

from .schema import (  # noqa: F401
    Schema, Check, Transform,
    string, integer, float_, number, decimal, boolean, string_boolean,
    literal, null, any_, atom, enum, date, time, datetime, naive_datetime,
    array, list_, map_set, tuple_, fields, map_, struct, keyword, map_kv,
    union, intersection, discriminated_union, lazy, json, codec,
    email, uuid, url, ipv4, ipv6, hex, base64, base64url, jwt,
    iso_date, iso_time, iso_datetime, iso_naive_datetime,
    to_date_struct, to_datetime_struct, to_naive_datetime_struct,
    to_time_struct,
    extend, pick, omit, traverse, coerce, coerce_all, reverse_codecs,
    object,
    register_kind, unregister_kind, custom,
)
from .validate import (  # noqa: F401
    ParseError, ValidationResult, encode, parse, prepare_form, validate,
    validate_strict,
)
from .errors import treefy_errors, prettify_errors  # noqa: F401
from .compile import RuleInfo, compile_schema  # noqa: F401
# NB the `describe` FUNCTION (Zoi.describe/1 parity) shadows the
# `zoi_spark.describe` submodule attribute; the module stays reachable
# as `zoi_spark.describe_mod` (and everything it exports is re-exported
# here anyway).
from . import describe as describe_mod  # noqa: F401
from .describe import describe, to_ddl, to_struct_type  # noqa: F401
from .json_schema import from_json_schema, to_json_schema  # noqa: F401
from .struct_keys import enforce_keys, struct_fields  # noqa: F401
from . import bucketing, pipeline, sampling, urls  # noqa: F401

# Zoi.type_spec/2 analogue: the engine-native "typespec" is the Spark
# schema — exported as both StructType and DDL string emission.
type_spec = to_ddl

# `object` (Zoi object/2 parity alias) shadows the builtin for
# star-import users — kept importable explicitly but OUT of __all__.
__all__ = [
    "Schema", "Check", "Transform",
    "string", "integer", "float_", "number", "decimal", "boolean",
    "string_boolean", "literal", "null", "any_", "atom", "enum", "date",
    "time", "datetime", "naive_datetime", "array", "list_", "map_set",
    "tuple_", "fields", "map_", "struct", "keyword", "map_kv", "union",
    "intersection", "discriminated_union", "lazy", "json", "codec",
    "email", "uuid", "url", "ipv4", "ipv6", "hex", "base64", "base64url",
    "jwt", "iso_date", "iso_time", "iso_datetime", "iso_naive_datetime",
    "to_date_struct", "to_datetime_struct", "to_naive_datetime_struct",
    "to_time_struct",
    "extend", "pick", "omit", "traverse", "coerce", "coerce_all",
    "reverse_codecs", "ParseError", "ValidationResult", "encode", "parse",
    "prepare_form", "validate", "validate_strict", "treefy_errors",
    "prettify_errors", "RuleInfo", "compile_schema", "describe",
    "describe_mod", "to_ddl", "to_struct_type", "from_json_schema",
    "to_json_schema", "enforce_keys", "struct_fields", "type_spec",
    "pipeline", "urls", "bucketing",
]

__version__ = "0.3.0"
