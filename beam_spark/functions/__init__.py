"""Scalar function parity layer (SURVEY.md §2.9 function surface).

Every scalar operator Beam SQL asserts in BeamSqlDslSqlStdOperatorsTest
(ABS..YEAR list, SURVEY.md §2.9) is native Spark SQL, as are the extra
Beam UDFs (BuiltinStringFunctions.java:36-223, BuiltinHashFunctions.java:
34-132). This module records the mapping (so SURVEY §2 coverage is
checkable) and provides the few name shims where Spark spells the
function differently. Everything stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Beam SQL scalar operator -> Spark SQL function name (identical unless
#: noted). Asserted native by tests/test_functions.py.
BEAM_TO_SPARK_FUNCTIONS = {
    # math (BeamSqlDslSqlStdOperatorsTest)
    "ABS": "abs", "ACOS": "acos", "ASIN": "asin", "ATAN": "atan",
    "CEIL": "ceil", "COS": "cos", "COT": "cot", "DEGREES": "degrees",
    "EXP": "exp", "FLOOR": "floor", "LN": "ln", "MOD": "mod", "PI": "pi",
    "POWER": "power", "RADIANS": "radians", "RAND": "rand", "ROUND": "round",
    "SIGN": "sign", "SIN": "sin", "SQRT": "sqrt", "TAN": "tan",
    "TRUNCATE": "trunc",  # numeric truncate; date trunc is date_trunc
    # string
    "CHAR_LENGTH": "char_length", "INITCAP": "initcap", "LOWER": "lower",
    "UPPER": "upper", "OVERLAY": "overlay", "POSITION": "position",
    "SUBSTRING": "substring", "TRIM": "trim", "LIKE": "like",
    # Beam BuiltinStringFunctions
    "ENDS_WITH": "endswith", "STARTS_WITH": "startswith",
    "LENGTH": "length", "REVERSE": "reverse", "FROM_HEX": "unhex",
    "TO_HEX": "hex", "LPAD": "lpad", "RPAD": "rpad",
    # hashes (BuiltinHashFunctions)
    "MD5": "md5", "SHA1": "sha1", "SHA256": "sha2", "SHA512": "sha2",
    # datetime
    "DAYOFMONTH": "dayofmonth", "DAYOFWEEK": "dayofweek",
    "DAYOFYEAR": "dayofyear", "EXTRACT": "extract", "HOUR": "hour",
    "MINUTE": "minute", "MONTH": "month", "QUARTER": "quarter",
    "SECOND": "second", "WEEK": "weekofyear", "YEAR": "year",
    "TIMESTAMPADD": "timestampadd", "TIMESTAMPDIFF": "timestampdiff",
    # conditionals / misc
    "CASE": "case", "COALESCE": "coalesce", "NULLIF": "nullif",
    "CARDINALITY": "cardinality", "ELEMENT": "element_at",
    "IS_INF": "isnotnan",  # see shims below
    "IS_NAN": "isnan",
}


def sha512(col) -> Column:
    """Beam SHA512 -> sha2(col, 512)."""
    return F.sha2(col, 512)


def sha256(col) -> Column:
    return F.sha2(col, 256)


def is_inf(col) -> Column:
    """Beam IS_INF: Spark has no isinf; |x| = Infinity test."""
    c = F.col(col) if isinstance(col, str) else col
    return F.abs(c) == F.lit(float("inf"))


def to_json(col) -> Column:
    """Beam ToJson.java -> to_json(struct)."""
    return F.to_json(col)


def json_to_row(col, schema) -> Column:
    """Beam JsonToRow.java -> from_json."""
    return F.from_json(col, schema)
