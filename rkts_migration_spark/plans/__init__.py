"""Physical-plan inspection: the guardrails that keep plan quality
(pushdown, broadcast joins, exchange counts, codegen coverage) asserted
in tests instead of eyeballed."""

from .inspect import (  # noqa: F401
    physical_plan,
    count_exchanges,
    has_broadcast_join,
    pushed_filters,
    codegen_fraction,
)
