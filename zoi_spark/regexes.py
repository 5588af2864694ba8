"""Format regexes, translated to Java-regex dialect for `Column.rlike`.

Mirrors the pattern catalogue of the reference (``lib/zoi/regexes.ex``).
All patterns below are lookahead-compatible with java.util.regex, so
they evaluate JVM-side inside whole-stage codegen — no Python in the
hot path. Elixir's ``/i`` flag becomes an inline ``(?i)`` group.
"""

from __future__ import annotations

# "Reasonable" default email (lib/zoi/regexes.ex:7-9), /i → (?i).
EMAIL = r"(?i)^(?!\.)(?!.*\.\.)([a-z0-9_'+\-\.]*)[a-z0-9_+\-]@([a-z0-9][a-z0-9\-]*\.)+[a-z]{2,}$"

# HTML5 input[type=email] (lib/zoi/regexes.ex:14-16).
HTML5_EMAIL = (
    r"(?i)^[\w.!#$%&'*+/=?^`{|}~-]+@[a-z\d](?:[a-z\d-]{0,61}[a-z\d])?"
    r"(?:\.[a-z\d](?:[a-z\d-]{0,61}[a-z\d])?)*$"
)

# RFC 5322 (lib/zoi/regexes.ex:21-23).
RFC5322_EMAIL = (
    r"^(?:\"[^\"]+\"|[!#-'*+/-9=?A-Z^_`a-z{|}~]+)@"
    r"(?:[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?\.)+[A-Za-z]{2,63}$"
)

# Phoenix-style permissive email (lib/zoi/regexes.ex:28-30).
SIMPLE_EMAIL = r"^[^@,;\s]+@[^@,;\s]+$"

UPCASE = r"^[^a-z]*$"    # lib/zoi/regexes.ex:35-37
DOWNCASE = r"^[^A-Z]*$"  # lib/zoi/regexes.ex:42-44

_UUID_VERSIONS = {"v1", "v2", "v3", "v4", "v5", "v6", "v7", "v8"}


def uuid(version: str | None = None) -> str:
    """UUID pattern; optional version narrows the third group's first
    hex digit (lib/zoi/regexes.ex:49-63)."""
    if version is None:
        ver = "[1-8]"
    elif version in _UUID_VERSIONS:
        ver = f"[{version[1]}]"
    else:
        raise ValueError(f"Invalid UUID version: {version}")
    return (
        r"^([0-9a-fA-F]{8}-[0-9a-fA-F]{4}-" + ver +
        r"[0-9a-fA-F]{3}-[89abAB][0-9a-fA-F]{3}-[0-9a-fA-F]{12})$"
    )


# lib/zoi/regexes.ex:70-72 — NB \b after \.? as in the reference.
IPV4 = r"^((25[0-5]|(2[0-4]|1\d|[1-9]|)\d)\.?\b){4}$"

# lib/zoi/regexes.ex:79-81 (unanchored in the reference too).
IPV6 = (
    r"(([0-9a-fA-F]{1,4}:){7,7}[0-9a-fA-F]{1,4}|([0-9a-fA-F]{1,4}:){1,7}:|"
    r"([0-9a-fA-F]{1,4}:){1,6}:[0-9a-fA-F]{1,4}|"
    r"([0-9a-fA-F]{1,4}:){1,5}(:[0-9a-fA-F]{1,4}){1,2}|"
    r"([0-9a-fA-F]{1,4}:){1,4}(:[0-9a-fA-F]{1,4}){1,3}|"
    r"([0-9a-fA-F]{1,4}:){1,3}(:[0-9a-fA-F]{1,4}){1,4}|"
    r"([0-9a-fA-F]{1,4}:){1,2}(:[0-9a-fA-F]{1,4}){1,5}|"
    r"[0-9a-fA-F]{1,4}:((:[0-9a-fA-F]{1,4}){1,6})|"
    r":((:[0-9a-fA-F]{1,4}){1,7}|:)|"
    r"fe80:(:[0-9a-fA-F]{0,4}){0,4}%[0-9a-zA-Z]{1,}|"
    r"::(ffff(:0{1,4}){0,1}:){0,1}"
    r"((25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9])\.){3,3}"
    r"(25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9])|"
    r"([0-9a-fA-F]{1,4}:){1,4}:"
    r"((25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9])\.){3,3}"
    r"(25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9]))"
)

HEX = r"^[0-9a-fA-F]*$"  # lib/zoi/regexes.ex:86-88

# Strict base64 / base64url shapes (the reference decodes with
# Base.decode64, types/string.ex:133-157; we validate shape JVM-side —
# a shape-valid base64 string always decodes).
BASE64 = r"^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$"
BASE64URL = r"^(?:[A-Za-z0-9_-]{4})*(?:[A-Za-z0-9_-]{2}(?:==)?|[A-Za-z0-9_-]{3}=?)?$"

# JWT: three dot-separated base64url segments (types/string.ex:159-174).
JWT = r"^[A-Za-z0-9_-]+\.[A-Za-z0-9_-]+\.[A-Za-z0-9_-]*$"

# Strict scalar-coercion guards — Spark casts are lenient ("12abc" →
# null / partial), the reference rejects trailing garbage
# (types/integer.ex:66-71, types/float.ex:66-71).
INTEGER_STRICT = r"^[+-]?\d+$"
FLOAT_STRICT = r"^[+-]?\d+(\.\d+)?([eE][+-]?\d+)?$"
ISO_DATE = r"^\d{4}-\d{2}-\d{2}$"
ISO_TIME = r"^\d{2}:\d{2}:\d{2}(\.\d{1,6})?$"
ISO_NAIVE_DATETIME = r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(\.\d{1,6})?$"
ISO_DATETIME = r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(\.\d{1,6})?(Z|[+-]\d{2}:?\d{2})$"
