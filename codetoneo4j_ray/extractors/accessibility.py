"""Roslyn Accessibility enum ordering + the reference's gates.

Ordering per Microsoft.CodeAnalysis.Accessibility (public API):
NotApplicable=0 < Private=1 < ProtectedAndInternal=2 < Protected=3 <
Internal=4 < ProtectedOrInternal=5 < Public=6.

Gates:
  - IsPublicAccessible(min) = min <= Public and min != NotApplicable
    (Technologies/DocumentHandlerBase.cs:56-57) — used by CSS/HTML/JSON/
    Razor-directive handlers; note the reference CLI default min is
    NotApplicable (Program.cs:81-82), under which these handlers emit
    nothing.  Our engine defaults to Private.
  - IsAccessibilityBelowMinimum(sym, min) = declared < min and declared !=
    NotApplicable and not explicit-interface-impl
    (Technologies/DotNet/CSharp/AccessibilityFilter.cs:14-26).
"""

from __future__ import annotations

NOT_APPLICABLE = 0
PRIVATE = 1
PROTECTED_AND_INTERNAL = 2
PROTECTED = 3
INTERNAL = 4
PROTECTED_OR_INTERNAL = 5
PUBLIC = 6

ORDER = {
    "NotApplicable": NOT_APPLICABLE,
    "Private": PRIVATE,
    "ProtectedAndInternal": PROTECTED_AND_INTERNAL,
    "Protected": PROTECTED,
    "Internal": INTERNAL,
    "ProtectedOrInternal": PROTECTED_OR_INTERNAL,
    "Public": PUBLIC,
}

NAME = {v: k for k, v in ORDER.items()}

DEFAULT_MIN_ACCESSIBILITY = "Private"


def level(name: str) -> int:
    return ORDER[name]


def is_public_accessible(min_accessibility: str) -> bool:
    lv = level(min_accessibility)
    return lv <= PUBLIC and lv != NOT_APPLICABLE


def is_below_minimum(
    declared: str, min_accessibility: str, explicit_interface_impl: bool = False
) -> bool:
    d = level(declared)
    return (
        d < level(min_accessibility)
        and d != NOT_APPLICABLE
        and not explicit_interface_impl
    )
