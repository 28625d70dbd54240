"""Plan introspection: typed scale-property audits of physical plans."""

from .audit import (  # noqa: F401
    PlanAudit,
    ScaleSafetyError,
    assert_scale_safe,
    audit,
    formatted_plan,
)

__all__ = [
    "PlanAudit",
    "ScaleSafetyError",
    "assert_scale_safe",
    "audit",
    "formatted_plan",
]
