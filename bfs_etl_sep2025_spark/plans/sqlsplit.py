"""Quote- and comment-aware SQL statement splitting.

The reference hands multi-statement strings to a single operator call and
relies on the client to split on ``;`` (``dags/dev_db_test.py:26,62-65``
builds ``"stmt1; stmt2; ..."``). Spark's ``spark.sql`` executes exactly one
statement, so the engine needs a faithful splitter: semicolons inside
single/double-quoted literals, backquoted identifiers, ``--`` line comments
and ``/* */`` block comments must NOT split.
"""

from __future__ import annotations


def split_statements(sql: str) -> list[str]:
    stmts: list[str] = []
    buf: list[str] = []
    i, n = 0, len(sql)
    state: str | None = None  # None | "'" | '"' | '`' | '--' | '/*'
    while i < n:
        ch = sql[i]
        two = sql[i : i + 2]
        if state is None:
            if ch == ";":
                stmt = "".join(buf).strip()
                if stmt:
                    stmts.append(stmt)
                buf = []
                i += 1
                continue
            if ch in ("'", '"', "`"):
                state = ch
            elif two == "--":
                state = "--"
                buf.append(two)
                i += 2
                continue
            elif two == "/*":
                state = "/*"
                buf.append(two)
                i += 2
                continue
            buf.append(ch)
            i += 1
        elif state in ("'", '"', "`"):
            buf.append(ch)
            if ch == "\\" and state != "`" and i + 1 < n:
                buf.append(sql[i + 1])  # escaped char inside a string literal
                i += 2
                continue
            if ch == state:
                if state == "'" and sql[i + 1 : i + 2] == "'":
                    buf.append("'")  # doubled '' escape
                    i += 2
                    continue
                state = None
            i += 1
        elif state == "--":
            buf.append(ch)
            if ch == "\n":
                state = None
            i += 1
        elif state == "/*":
            if two == "*/":
                buf.append(two)
                state = None
                i += 2
                continue
            buf.append(ch)
            i += 1
    tail = "".join(buf).strip()
    if tail:
        stmts.append(tail)
    return stmts
