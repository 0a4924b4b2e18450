"""MySQL-style format specifiers for ``formatDateTime`` (reference
src/Functions/formatDateTime.cpp, default settings: leading zeros on,
``%f`` prints six digits, ``%M`` is the full month name).

``segments(fmt)`` compiles a CH format string into a list of
(kind, payload) items:

  ("pat", spark_pattern_text)  — direct Spark date_format pattern
  ("lit", literal_text)        — literal output characters
  ("expr", key)                — computed specifier (no Spark pattern
                                 equivalent); key indexes COMPUTED_SQL

Unknown specifiers and the reference's own unimplemented set
(%U %v %x %X — week-mode variants) raise ValueError, matching the
reference's BAD_ARGUMENTS / NOT_IMPLEMENTED rejections.
"""

from __future__ import annotations

# specifier -> Spark datetime pattern (semantics per the reference's
# Instruction table: %c zero-padded month, %k/%l zero-padded hours,
# %s == %S seconds, %z = +hhmm offset)
SIMPLE = {
    "a": "EEE", "b": "MMM", "c": "MM", "d": "dd", "D": "MM/dd/yy",
    "f": "SSSSSS", "F": "yyyy-MM-dd", "j": "DDD", "m": "MM",
    "M": "MMMM", "W": "EEEE", "y": "yy", "Y": "yyyy", "p": "a",
    "r": "hh:mm a", "R": "HH:mm", "s": "ss", "S": "ss",
    "T": "HH:mm:ss", "h": "hh", "H": "HH", "i": "mm", "I": "hh",
    "k": "HH", "l": "hh", "z": "Z",
}

# specifier -> SQL template over the (already-translated) operand {x}
COMPUTED_SQL = {
    # year / 100, zero-padded (00-99)
    "C": "lpad(CAST(CAST(floor(year({x}) / 100) AS INT) AS STRING), "
         "2, '0')",
    # day of month, space-padded ( 1-31)
    "e": "lpad(CAST(day({x}) AS STRING), 2, ' ')",
    # two-digit / four-digit ISO 8601 week-year
    "g": "lpad(CAST(date_part('YEAROFWEEK', {x}) % 100 AS STRING), "
         "2, '0')",
    "G": "CAST(date_part('YEAROFWEEK', {x}) AS STRING)",
    # ISO weekday, Monday=1 (Spark weekday(): Monday=0)
    "u": "CAST(weekday({x}) + 1 AS STRING)",
    # ISO 8601 week number, zero-padded
    "V": "lpad(CAST(weekofyear({x}) AS STRING), 2, '0')",
    # weekday with Sunday=0 (Spark dayofweek(): Sunday=1)
    "w": "CAST(dayofweek({x}) - 1 AS STRING)",
    # quarter 1-4, single digit
    "Q": "CAST(quarter({x}) AS STRING)",
}

LITERAL = {"n": "\n", "t": "\t", "%": "%"}

_UNSUPPORTED = {"U", "v", "x", "X"}


def segments(fmt: str) -> list[tuple[str, str]]:
    """Compile ``fmt`` into (kind, payload) segments; adjacent literal
    text is merged.  Raises ValueError on unsupported specifiers."""
    out: list[tuple[str, str]] = []

    def lit(text: str) -> None:
        if out and out[-1][0] == "lit":
            out[-1] = ("lit", out[-1][1] + text)
        else:
            out.append(("lit", text))

    i, n = 0, len(fmt)
    while i < n:
        ch = fmt[i]
        if ch != "%":
            lit(ch)
            i += 1
            continue
        if i + 1 >= n:
            lit("%")
            break
        sp = fmt[i + 1]
        if sp in SIMPLE:
            out.append(("pat", SIMPLE[sp]))
        elif sp in COMPUTED_SQL:
            out.append(("expr", sp))
        elif sp in LITERAL:
            lit(LITERAL[sp])
        elif sp in _UNSUPPORTED:
            raise ValueError(
                f"formatDateTime: %{sp} (week-mode variant) is not "
                f"supported (reference NOT_IMPLEMENTED)")
        else:
            raise ValueError(
                f"formatDateTime: incorrect syntax, symbol "
                f"'%{sp}' is not supported (reference BAD_ARGUMENTS)")
        i += 2
    return out


def merge_pattern_runs(segs: list[tuple[str, str]]):
    """Merge consecutive pat/lit segments into single Spark pattern
    strings (literal text single-quoted per the pattern grammar);
    yields ("pat", pattern) and ("expr", key) items."""
    run: list[str] = []
    for kind, payload in segs:
        if kind == "pat":
            run.append(payload)
        elif kind == "lit":
            run.append("'" + payload.replace("'", "''") + "'")
        else:
            if run:
                yield ("pat", "".join(run))
                run = []
            yield ("expr", payload)
    if run:
        yield ("pat", "".join(run))
