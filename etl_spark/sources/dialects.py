"""Per-dialect SQL generation for the JDBC surfaces (SURVEY.md §2.1).

The reference speaks three dialects natively and re-implements the
same INSERT construction per engine (web_scheduler.py:4390-4480):
MySQL via pymysql with backtick identifier quoting, ``%s``
placeholders, utf8mb4 and default port 3306; PostgreSQL via psycopg2
with double-quote quoting, ``%s`` and port 5432; SQLite via sqlite3
with double-quote quoting and ``?`` placeholders. Its connect budget
is 30 s (web_scheduler.py:913-914).

On Spark the write path is `spark.read/write.format("jdbc")` (see
``jdbc.py``), so most of this never becomes hand-built SQL — but
three dialect-sensitive artifacts still must be generated as TEXT and
are therefore testable without a live server:

- the JDBC **url** (engine scheme, default port, charset properties);
- **identifier quoting** for table/column names the engine sees
  (Spark quotes with the JdbcDialect's quote char; anything we
  splice into ``query``/``dbtable`` options must match);
- the **createTableColumnTypes** option — Spark's hook for the S7
  auto-create sink: a comma-separated ``col TYPE`` list in the
  TARGET dialect's types, overriding Spark's defaults.

No MySQL/PostgreSQL server exists in the test container, so the
tests (tests/test_io.py) assert the generated SQL/option text per
dialect — the same quoting/type decisions the reference hard-codes —
while the end-to-end JDBC path is exercised against embedded Derby.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.types import DataType, DecimalType

DEFAULT_CONNECT_TIMEOUT_S = 30  # web_scheduler.py:913-914


@dataclass(frozen=True)
class Dialect:
    """One engine's SQL-generation conventions. ``type_map`` keys are
    Spark DataType simpleStrings (decimal handled separately)."""

    name: str
    quote: str  # identifier quote character
    placeholder: str  # DB-API parameter marker the reference uses
    default_port: int
    jdbc_scheme: str
    driver_class: str
    url_props: tuple[tuple[str, str], ...] = field(default_factory=tuple)
    type_map: tuple[tuple[str, str], ...] = field(default_factory=tuple)

    def quote_ident(self, name: str) -> str:
        """Quote one identifier, escaping embedded quote chars by
        doubling (both backtick and double-quote dialects escape this
        way). Rejects NUL — no engine accepts it and it only appears
        in injection attempts."""
        if "\x00" in name:
            raise ValueError(f"NUL byte in identifier: {name!r}")
        return self.quote + name.replace(self.quote, self.quote * 2) + self.quote

    def insert_sql(self, table: str, columns: list[str]) -> str:
        """The reference's batch-INSERT statement for this dialect
        (web_scheduler.py:4410-4412 MySQL, 4443-4445 PostgreSQL,
        4468-4470 SQLite): quoted table and column list, one
        placeholder per column."""
        if not columns:
            raise ValueError("insert_sql needs at least one column")
        cols = ", ".join(self.quote_ident(c) for c in columns)
        ph = ", ".join([self.placeholder] * len(columns))
        return (
            f"INSERT INTO {self.quote_ident(table)} ({cols}) VALUES ({ph})"
        )

    def jdbc_url(self, host: str, database: str, port: int | None = None) -> str:
        """jdbc:<scheme>://host:port/db with the dialect's fixed
        properties (MySQL carries the reference's utf8mb4 charset).
        SQLite is file-based — the Xerial driver expects
        ``jdbc:sqlite:<path>`` and would treat a ``//host:port/db``
        authority as a filesystem path, so ``database`` is the file
        path and host/port are rejected rather than silently
        mis-encoded (ADVICE r7)."""
        if self.jdbc_scheme == "sqlite":
            if host or port:
                raise ValueError(
                    "SQLite JDBC URLs are file-form jdbc:sqlite:<path>; "
                    "pass the db file path as `database` and no host/port"
                )
            return f"jdbc:{self.jdbc_scheme}:{database}"
        p = port or self.default_port
        url = f"jdbc:{self.jdbc_scheme}://{host}:{p}/{database}"
        if self.url_props:
            url += "?" + "&".join(f"{k}={v}" for k, v in self.url_props)
        return url

    def ddl_type(self, dt: DataType) -> str:
        """Map a Spark type to this dialect's column type for the S7
        auto-create sink."""
        if isinstance(dt, DecimalType):
            return f"DECIMAL({dt.precision},{dt.scale})"
        for k, v in self.type_map:
            if dt.simpleString() == k:
                return v
        raise ValueError(
            f"no {self.name} mapping for Spark type {dt.simpleString()!r}"
        )

    def create_table_column_types(self, schema) -> str:
        """Spark's ``createTableColumnTypes`` JDBC option: the
        auto-create column list in TARGET-dialect types. Column names
        are left unquoted — Spark quotes them itself with the
        engine's JdbcDialect when it builds the DDL."""
        return ", ".join(
            f"{f.name} {self.ddl_type(f.dataType)}" for f in schema.fields
        )


# Integer/float/text/temporal mappings follow each engine's canonical
# column types (what the reference's target tables use, TIMESTAMP
# included — web_scheduler.py:361-380): MySQL has no BOOLEAN storage
# type (it aliases TINYINT(1)); PostgreSQL spells double as DOUBLE
# PRECISION and has no unsigned/tiny variants.
MYSQL = Dialect(
    name="mysql",
    quote="`",
    placeholder="%s",  # pymysql, web_scheduler.py:4409
    default_port=3306,  # web_scheduler.py:4395
    jdbc_scheme="mysql",
    driver_class="com.mysql.cj.jdbc.Driver",
    url_props=(
        ("useUnicode", "true"),
        ("characterEncoding", "utf8mb4"),  # web_scheduler.py:4400
        ("connectTimeout", str(DEFAULT_CONNECT_TIMEOUT_S * 1000)),
    ),
    type_map=(
        ("tinyint", "TINYINT"),
        ("smallint", "SMALLINT"),
        ("int", "INT"),
        ("bigint", "BIGINT"),
        ("float", "FLOAT"),
        ("double", "DOUBLE"),
        ("string", "TEXT"),
        ("boolean", "TINYINT(1)"),
        ("date", "DATE"),
        ("timestamp", "TIMESTAMP"),
    ),
)

POSTGRESQL = Dialect(
    name="postgresql",
    quote='"',
    placeholder="%s",  # psycopg2, web_scheduler.py:4442
    default_port=5432,  # web_scheduler.py:4422
    jdbc_scheme="postgresql",
    driver_class="org.postgresql.Driver",
    url_props=(("connectTimeout", str(DEFAULT_CONNECT_TIMEOUT_S)),),
    type_map=(
        ("tinyint", "SMALLINT"),
        ("smallint", "SMALLINT"),
        ("int", "INTEGER"),
        ("bigint", "BIGINT"),
        ("float", "REAL"),
        ("double", "DOUBLE PRECISION"),
        ("string", "TEXT"),
        ("boolean", "BOOLEAN"),
        ("date", "DATE"),
        ("timestamp", "TIMESTAMP"),
    ),
)

SQLITE = Dialect(
    name="sqlite",
    quote='"',
    placeholder="?",  # sqlite3, web_scheduler.py:4467
    default_port=0,  # file-based; port unused
    jdbc_scheme="sqlite",
    driver_class="org.sqlite.JDBC",
    type_map=(
        ("tinyint", "INTEGER"),
        ("smallint", "INTEGER"),
        ("int", "INTEGER"),
        ("bigint", "INTEGER"),
        ("float", "REAL"),
        ("double", "REAL"),
        ("string", "TEXT"),
        ("boolean", "INTEGER"),
        ("date", "TEXT"),
        ("timestamp", "TEXT"),
    ),
)

DIALECTS: dict[str, Dialect] = {
    d.name: d for d in (MYSQL, POSTGRESQL, SQLITE)
}


def dialect_write_options(
    dialect: Dialect,
    host: str,
    database: str,
    table: str,
    schema=None,
    port: int | None = None,
    **extra,
) -> dict[str, str]:
    """Spark JDBC writer options for one dialect: url with the
    engine's scheme/port/charset, driver class, and — when a schema
    is given — ``createTableColumnTypes`` so the S7 auto-create sink
    creates the target with the dialect's own column types instead of
    Spark's defaults."""
    from etl_spark.sources.jdbc import jdbc_write_options

    opts = jdbc_write_options(
        url=dialect.jdbc_url(host, database, port),
        table=table,
        driver=dialect.driver_class,
        **extra,
    )
    if schema is not None:
        opts["createTableColumnTypes"] = dialect.create_table_column_types(
            schema
        )
    return opts


__all__ = [
    "Dialect",
    "MYSQL",
    "POSTGRESQL",
    "SQLITE",
    "DIALECTS",
    "dialect_write_options",
]
