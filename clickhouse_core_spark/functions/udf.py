"""User-defined function surface.

Reference (§2.10): SQL lambda UDFs macro-expand in the query tree
(src/Functions/UserDefined/UserDefinedSQLFunctionFactory.h); executable
UDFs stream rows through an external process
(src/Functions/UserDefined/UserDefinedExecutableFunction.h); table
functions come from C++ (src/TableFunctions/).

Spark mapping:
- SQL lambda UDF  -> a python function Column -> Column, registered in
  our function registry (macro expansion happens at plan build, same
  as the reference's query-tree substitution);
- executable UDF  -> Arrow-batched pandas_udf (the process boundary the
  reference crosses per block, Spark crosses per Arrow batch — same
  shape, faster transport);
- executable table function -> Python UDTF (Spark 3.5+) / mapInArrow.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

# registry of SQL-lambda-style UDFs: name -> Column-level callable
_SQL_UDFS: dict[str, Callable[..., Column]] = {}


def create_function(name: str, fn: Callable[..., Column]) -> None:
    """CREATE FUNCTION name AS (args) -> expr — macro registration.
    The callable takes/returns Columns, so calls inline into the plan
    (no execution boundary, exactly like the reference's substitution).
    """
    _SQL_UDFS[name] = fn


def call_function(name: str, *args) -> Column:
    if name not in _SQL_UDFS:
        raise KeyError(f"unknown SQL UDF {name!r}")
    return _SQL_UDFS[name](*args)


def register_executable_udf(spark: SparkSession, name: str,
                            batch_fn: Callable[[pd.Series], pd.Series],
                            return_type: str) -> None:
    """Executable-UDF analog: ``batch_fn`` receives a pandas Series per
    Arrow batch (the reference feeds blocks to a child process via
    stdin; Arrow batches are the Spark-native equivalent).  Registered
    for both DataFrame and spark.sql use."""
    pudf = F.pandas_udf(batch_fn, returnType=return_type)
    spark.udf.register(name, pudf)


def register_python_udtf(spark: SparkSession, name: str, cls,
                         return_type: str) -> None:
    """Executable-table-function analog via Python UDTF (Spark 3.5+)."""
    from pyspark.sql.functions import udtf
    spark.udtf.register(name, udtf(cls, returnType=return_type))


def register_sql_scalar_udfs(spark: SparkSession) -> list[str]:
    """Register the UDF-backed scalar long tail as SQL-callable
    functions, so CH-SQL text (and plain spark.sql) can call the names
    that have no Catalyst form: normalizeUTF8NF*, punycode/idna/base58
    codecs, RIPEMD160/SHA512_256/keccak256/MD4, sqidDecode,
    seriesPeriodDetectFFT.

    Column-level callers use the registry (`ch.*`) directly — this is
    only the SQL-name bridge (reference: every function name is
    SQL-callable; src/Functions/FunctionFactory.h).  Returns the list
    of registered names.
    """
    import hashlib as _hl
    import unicodedata as _ud

    from clickhouse_core_spark.functions import sqids_codec as _sq
    from clickhouse_core_spark.functions import purehash as _ph
    from clickhouse_core_spark.functions import unicode_ext as _ux

    STR = "string"
    regs: list[tuple[str, Callable, str]] = [
        ("punycodeEncode", _ux._punycode_encode, STR),
        ("punycodeDecode", _ux._punycode_decode, STR),
        ("tryPunycodeDecode", lambda v: _ux._punycode_decode(v, ""), STR),
        ("idnaEncode", _ux._idna_encode, STR),
        ("tryIdnaEncode", lambda v: _ux._idna_encode(v, ""), STR),
        ("idnaDecode", _ux._idna_decode, STR),
        ("base58Encode", _ux._base58_encode, STR),
        ("base58Decode", _ux._base58_decode, STR),
        ("tryBase58Decode", lambda v: _ux._base58_decode(v, ""), STR),
        ("keccak256", lambda v: _ph.keccak256(v.encode()), "binary"),
        ("sqidDecode", _sq.sqid_decode, "array<bigint>"),
    ]
    for form in ("NFC", "NFD", "NFKC", "NFKD"):
        regs.append((f"normalizeUTF8{form}",
                     lambda v, _f=form: _ud.normalize(_f, v), STR))
    # digest functions return their BYTES (the reference's FixedString
    # carrier) so corpus idioms like hex(MD4('test')) compose correctly
    for name, algo in (("RIPEMD160", "ripemd160"),
                       ("SHA512_256", "sha512_256")):
        if _ux._hashlib_available(algo):
            regs.append((name, lambda v, _a=algo: _hl.new(
                _a, v.encode()).digest(), "binary"))
    regs.append(("MD4", (lambda v: _hl.new("md4", v.encode()).digest())
                 if _ux._hashlib_available("md4")
                 else (lambda v: _ph.md4(v.encode())), "binary"))

    from clickhouse_core_spark.functions import longtail5 as _lt5
    spark.udf.register(
        "formatReadableTimeDelta",
        lambda *a: _lt5._frtd_py(a[0],
                                 a[1] if len(a) > 1 else "",
                                 a[2] if len(a) > 2 else ""),
        "string")

    from clickhouse_core_spark.functions import seriesfns as _sf
    registered = []
    for name, fn, rtype in regs:
        wrapped = (lambda _fn: lambda v: None if v is None
                   else _fn(v))(fn)
        spark.udf.register(name, wrapped, rtype)
        registered.append(name)
    spark.udf.register(
        "seriesPeriodDetectFFT",
        lambda v: None if v is None else _sf.period_detect_fft(list(v)),
        "double")
    registered.append("seriesPeriodDetectFFT")
    registered.append("formatReadableTimeDelta")
    return registered
