"""Logical-date templating: render ``{{ expr }}`` against the run context.

The reference leans on Airflow's Jinja templating exactly once, to derive a
dated filename from the logical date: ``{{ ds[5:7] + ds[8:10] + ds[0:4] }}``
(``dags/s3_data_copy_test.py:34``, turning ``YYYY-MM-DD`` into ``MMDDYYYY``).
That expression is plain Python over template variables, so a tiny evaluator
(`eval` with empty builtins over the context mapping) reproduces the
semantics without a Jinja dependency; any ``{{ ... }}`` expression over the
standard context variables works.

Context variables mirror Airflow's best-known names:
``ds`` (YYYY-MM-DD), ``ds_nodash``, ``ts`` (ISO timestamp),
``logical_date``/``execution_date`` (datetime), ``run_id``.
"""

from __future__ import annotations

import re
from collections.abc import Mapping
from datetime import datetime
from typing import Any

_EXPR = re.compile(r"\{\{(.*?)\}\}", re.DOTALL)


def build_context(logical_date: datetime, run_id: str = "") -> dict[str, Any]:
    ds = logical_date.date().isoformat()
    return {
        "ds": ds,
        "ds_nodash": ds.replace("-", ""),
        "ts": logical_date.isoformat(),
        "logical_date": logical_date,
        "execution_date": logical_date,  # legacy alias
        "run_id": run_id or f"scheduled__{logical_date.isoformat()}",
    }


def render(template: str, context: Mapping[str, Any]) -> str:
    """Replace every ``{{ expr }}`` with ``str(eval(expr, context))``.

    Builtins are stripped; expressions can only touch context names (and
    their methods) — enough for the reference's slicing/concat idiom while
    keeping task definitions data, not code.
    """

    def _sub(m: re.Match[str]) -> str:
        expr = m.group(1).strip()
        try:
            val = eval(expr, {"__builtins__": {}}, dict(context))  # noqa: S307
        except Exception as exc:
            raise ValueError(f"template expression {expr!r} failed: {exc}") from exc
        return str(val)

    return _EXPR.sub(_sub, template)


def render_any(value: Any, context: Mapping[str, Any]) -> Any:
    """Render strings, and recurse into lists/tuples/dicts (operator kwargs
    arrive in those shapes — e.g. the reference's ``files=[...]`` list)."""
    if isinstance(value, str):
        return render(value, context)
    if isinstance(value, (list, tuple)):
        return type(value)(render_any(v, context) for v in value)
    if isinstance(value, dict):
        return {k: render_any(v, context) for k, v in value.items()}
    return value
