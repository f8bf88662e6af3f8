"""Snowflake ``QUALIFY`` -> Spark SQL window+filter rewrite.

Snowflake lets a query filter on window functions in-line::

    SELECT c1, c2 FROM t QUALIFY row_number() OVER (PARTITION BY c1
                                                    ORDER BY c2) = 1

Spark SQL (4.x session catalog) has no QUALIFY clause, but the semantics —
evaluate the window predicate over the post-GROUP-BY/HAVING result, keep
rows where it's true — compose from what it does have::

    SELECT * EXCEPT (__qualify__) FROM (
      SELECT __q.*, (<pred>) AS __qualify__ FROM ( <head> ) AS __q
    ) WHERE __qualify__  <order-by/limit tail>

The window expressions compute over exactly the head's rows (same frame
Snowflake gives them), the boolean lands in a helper column, the filter
drops rows, ``* EXCEPT`` (Spark 3.4+) drops the helper from the schema.

Reference surface: the reference contracts for arbitrary Snowflake SQL
through ``SnowflakeOperator`` (``/root/reference/dags/dev_db_test.py:41-70``),
so Snowflake-dialect spellings reachable through that chokepoint belong to
the engine's dialect shim (see ``plans/tasks.py`` for TRANSIENT/sysdate/
datetime).

Scope: the QUALIFY must be top-level (not inside a subquery — Spark planning
inside nested scopes would need a real parser); the predicate may reference
select-list aliases or contain inline window calls, the common Snowflake
shapes. Keyword detection is quote-, comment-, and paren-aware. Two
documented restrictions (ADVICE r3): ``SELECT DISTINCT ... QUALIFY`` is
REJECTED with ValueError — Snowflake evaluates QUALIFY before DISTINCT, but
the wrap would run DISTINCT first and can keep different rows; and an ORDER
BY tail after QUALIFY may only reference columns in the select list (the
wrap hides the head's other columns from the outer sort).
"""

from __future__ import annotations

import re

_HELPER = "__qualify__"

#: keywords that can follow the QUALIFY predicate at top level
_TAIL_RE = re.compile(r"(?i)^(ORDER|LIMIT|OFFSET)\b")
_QUALIFY_RE = re.compile(r"(?i)^QUALIFY\b")


def _unquoted_positions(sql: str) -> set[int]:
    """Indices of chars outside quotes and comments, at ANY paren depth —
    the span where dialect keyword substitution is safe (a membership set,
    not an ordered walk; contrast ``_top_level_positions``)."""
    return set(_scan_positions(sql, any_depth=True))


def _top_level_positions(sql: str) -> list[int]:
    """Indices of chars at paren depth 0, outside quotes and comments
    (ascending — callers rely on the order)."""
    return _scan_positions(sql, any_depth=False)


def _scan_positions(sql: str, any_depth: bool) -> list[int]:
    out: list[int] = []
    i, n, depth = 0, len(sql), 0
    state: str | None = None
    while i < n:
        ch = sql[i]
        two = sql[i : i + 2]
        if state is None:
            if ch in ("'", '"', "`"):
                state = ch
            elif two == "--":
                state = "--"
                i += 2
                continue
            elif two == "/*":
                state = "/*"
                i += 2
                continue
            elif ch == "(":
                depth += 1
                if any_depth:
                    out.append(i)
            elif ch == ")":
                depth -= 1
                if any_depth:
                    out.append(i)
            elif any_depth or depth == 0:
                out.append(i)
            i += 1
        elif state in ("'", '"', "`"):
            if ch == "\\" and state != "`" and i + 1 < n:
                i += 2
                continue
            if ch == state:
                if state == "'" and sql[i + 1 : i + 2] == "'":
                    i += 2
                    continue
                state = None
            i += 1
        elif state == "--":
            if ch == "\n":
                state = None
            i += 1
        else:  # /*
            if two == "*/":
                state = None
                i += 2
                continue
            i += 1
    return out


def sub_unquoted(pattern: re.Pattern, repl, text: str) -> str:
    """``pattern.sub(repl, text)`` applied only to matches that START
    outside string literals and comments, so a dialect keyword quoted as
    data (``SELECT 'IFF(x)' AS note``) is never rewritten (ADVICE r3)."""
    ok = _unquoted_positions(text)

    def _repl(m: re.Match) -> str:
        if m.start() not in ok:
            return m.group(0)
        return repl(m) if callable(repl) else m.expand(repl)

    return pattern.sub(_repl, text)


_SELECT_RE = re.compile(r"(?i)^SELECT\b")


def rewrite_qualify(stmt: str) -> str:
    """Return ``stmt`` unchanged if it has no top-level QUALIFY; otherwise
    the window+filter rewrite with an identical output schema. A statement
    prefix ahead of the query block (CTAS ``CREATE TABLE ... AS``,
    ``INSERT INTO ...``) is preserved verbatim — only the SELECT body is
    wrapped."""
    positions = _top_level_positions(stmt)
    q_at = None
    sel_at = None
    for i in positions:
        if sel_at is None and _SELECT_RE.match(stmt[i:]) and (
            i == 0 or not stmt[i - 1].isalnum()
        ):
            sel_at = i
        if _QUALIFY_RE.match(stmt[i:]) and (i == 0 or not stmt[i - 1].isalnum()):
            q_at = i
            break
    if q_at is None or sel_at is None or sel_at >= q_at:
        return stmt
    prefix = stmt[:sel_at]
    stmt = stmt[sel_at:]
    q_at -= sel_at
    head = stmt[:q_at].rstrip()
    if re.match(r"(?is)^SELECT\s+DISTINCT\b", head):
        raise ValueError(
            "QUALIFY with SELECT DISTINCT is unsupported: Snowflake runs "
            "QUALIFY before DISTINCT; the window+filter rewrite would "
            "invert that order. Deduplicate in a subquery instead."
        )
    rest = stmt[q_at + len("QUALIFY") :]
    # find where the predicate ends (top-level ORDER BY / LIMIT / OFFSET)
    tail_at = None
    for i in _top_level_positions(rest):
        if _TAIL_RE.match(rest[i:]) and (i == 0 or not rest[i - 1].isalnum()):
            tail_at = i
            break
    pred = (rest[:tail_at] if tail_at is not None else rest).strip()
    tail = rest[tail_at:].strip() if tail_at is not None else ""
    out = (
        f"SELECT * EXCEPT ({_HELPER}) FROM ("
        f"SELECT __q.*, ({pred}) AS {_HELPER} FROM ({head}) AS __q"
        f") WHERE {_HELPER}"
    )
    if tail:
        out = f"{out} {tail}"
    return prefix + out
