"""Type system: source-DDL name -> Spark type mapping + schema builder.

Re-expresses the reference's two eval-based DDL->PyArrow mapping tables
(/root/reference/utils/rdbms_operations.py:69-78 for MSSQL,
/root/reference/utils/redshift_operations.py:89-102 for Redshift) as
data-driven Spark ``StructType`` construction — no string ``eval``.

The reference widens booleans to int16 (rdbms_operations.py:71) and
stores datetimes at ms precision (``pa.timestamp("ms")``,
rdbms_operations.py:77); both behaviors are preserved here so outputs
are byte-compatible with what the reference would have landed on S3.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

# MSSQL type name -> Spark type factory.  ``p, s`` are precision/scale
# for parameterized types; non-parameterized factories ignore them.
# Mirrors /root/reference/utils/rdbms_operations.py:69-78.
MSSQL_TYPE_MAP: dict[str, object] = {
    "bigint": lambda p=None, s=None: T.LongType(),
    "int": lambda p=None, s=None: T.IntegerType(),
    "smallint": lambda p=None, s=None: T.ShortType(),
    "tinyint": lambda p=None, s=None: T.ShortType(),
    "bit": lambda p=None, s=None: T.ShortType(),  # bool widened, ref :71
    "boolean": lambda p=None, s=None: T.ShortType(),
    "decimal": lambda p=38, s=18: T.DecimalType(p, s),
    "numeric": lambda p=38, s=18: T.DecimalType(p, s),
    "money": lambda p=None, s=None: T.DecimalType(19, 4),  # ref :74
    "float": lambda p=None, s=None: T.FloatType(),
    "real": lambda p=None, s=None: T.FloatType(),
    "text": lambda p=None, s=None: T.StringType(),
    "char": lambda p=None, s=None: T.StringType(),
    "nchar": lambda p=None, s=None: T.StringType(),
    "varchar": lambda p=None, s=None: T.StringType(),
    "nvarchar": lambda p=None, s=None: T.StringType(),
    "uniqueidentifier": lambda p=None, s=None: T.StringType(),
    "timestamp": lambda p=None, s=None: T.StringType(),  # MSSQL rowversion
    "date": lambda p=None, s=None: T.DateType(),
    "datetime": lambda p=None, s=None: T.TimestampType(),  # ms precision
    "smalldatetime": lambda p=None, s=None: T.TimestampType(),
    "time": lambda p=None, s=None: T.TimestampType(),
}

# Redshift information_schema type name -> Spark type factory.
# Mirrors /root/reference/utils/redshift_operations.py:89-102.
REDSHIFT_TYPE_MAP: dict[str, object] = {
    "timestamp without time zone": lambda p=None, s=None: T.TimestampType(),
    "character varying": lambda p=None, s=None: T.StringType(),
    "varchar": lambda p=None, s=None: T.StringType(),
    "character": lambda p=None, s=None: T.StringType(),
    "numeric": lambda p=38, s=18: T.DecimalType(p, s),
    "double precision": lambda p=38, s=18: T.DoubleType(),
    "bigint": lambda p=None, s=None: T.LongType(),
    "integer": lambda p=None, s=None: T.IntegerType(),
    "smallint": lambda p=None, s=None: T.ShortType(),
    "date": lambda p=None, s=None: T.DateType(),
    "real": lambda p=None, s=None: T.FloatType(),
    "varbinary": lambda p=None, s=None: T.BinaryType(),
}

_DDL_RE = re.compile(
    r"^\s*(?P<name>\"[^\"]+\"|\[[^\]]+\]|[\w\- ]+?)\s+"
    r"(?P<type>[a-zA-Z ]+?)\s*"
    r"(?:\(\s*(?P<p>\d+)\s*(?:,\s*(?P<s>\d+)\s*)?\))?"
    r"\s*(?P<null>not\s+null|null)?\s*$",
    re.IGNORECASE,
)


def spark_type_for(type_name: str, precision: int | None = None, scale: int | None = None,
                   dialect: str = "mssql") -> T.DataType:
    """Resolve a source type name to a Spark DataType.

    ``dialect`` is ``"mssql"`` (source-derived schema path, reference
    S2) or ``"redshift"`` (target-derived path, reference S3).
    """
    table = MSSQL_TYPE_MAP if dialect == "mssql" else REDSHIFT_TYPE_MAP
    key = type_name.strip().lower()
    if key not in table:
        raise ValueError(f"unmapped {dialect} type: {type_name!r}")
    factory = table[key]
    if precision is not None and scale is not None:
        return factory(precision, scale)
    if precision is not None:
        return factory(precision)
    return factory()


def normalize_column_name(name: str) -> str:
    """Reference name standardization (rdbms_operations.py:239-243):
    lowercase, spaces->_, '-'->'', '__'->'_' (in that order)."""
    return name.lower().replace(" ", "_").replace("-", "").replace("__", "_")


def build_struct_type(
    columns: list[tuple] | list[str],
    dialect: str = "mssql",
    normalize_names: bool = True,
) -> T.StructType:
    """Build a StructType from a DDL-ish column spec.

    Accepts either tuples ``(name, type_name[, nullable[, p, s]])`` or
    strings like ``"amount decimal(18,6) null"``.  Replaces the
    reference's SQL-text-assembling ``eval`` path
    (rdbms_operations.py:47-122, redshift_operations.py:62-118) with a
    plain parser: schemas are data, never executed code.
    """
    fields: list[T.StructField] = []
    for col in columns:
        if isinstance(col, str):
            m = _DDL_RE.match(col)
            if not m:
                raise ValueError(f"unparseable column spec: {col!r}")
            name = m.group("name").strip('"[]')
            type_name = m.group("type")
            p = int(m.group("p")) if m.group("p") else None
            s = int(m.group("s")) if m.group("s") else None
            nullable = (m.group("null") or "null").lower() != "not null"
        else:
            name = col[0]
            type_name = col[1]
            nullable = bool(col[2]) if len(col) > 2 else True
            p = col[3] if len(col) > 3 else None
            s = col[4] if len(col) > 4 else None
        if normalize_names:
            name = normalize_column_name(name)
        fields.append(T.StructField(name, spark_type_for(type_name, p, s, dialect), nullable))
    return T.StructType(fields)


# Audit-field tail appended to every derived schema by the reference
# (rdbms_operations.py:115): row_hash_code, updatedby, updated_utc_ts, runid.
AUDIT_FIELDS = T.StructType(
    [
        T.StructField("row_hash_code", T.StringType(), True),
        T.StructField("updatedby", T.StringType(), True),
        T.StructField("updated_utc_ts", T.TimestampType(), True),
        T.StructField("runid", T.IntegerType(), True),
    ]
)


def with_audit_fields(schema: T.StructType) -> T.StructType:
    """Append the reference's 4 audit fields to a schema."""
    return T.StructType(list(schema.fields) + list(AUDIT_FIELDS.fields))
