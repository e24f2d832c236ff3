"""Optional-content (OCG / OCMD) visibility, PDF 32000-1 §8.11.

The reference PARSES ``/OCProperties`` into a declarative model
(``src/optional_content.rs:1-197``) but never consults ``/OC``
memberships when rendering, so text in always-hidden layers leaks into
its output. This module evaluates the DEFAULT configuration (``/D``)
so extraction can strip content in hidden layers (``strip_hidden_ocg``).

Scope: ON/OFF state lists + BaseState, and OCMD membership under the
default ``/AnyOn`` policy. ``/VE`` visibility expressions and usage
auto-states are out of scope (the reference has neither).
"""

from __future__ import annotations

from .objects import NULL, Name, Ref


def hidden_ocg_refs(doc) -> frozenset:
    """Refs of the OCGs hidden under the default configuration: with
    ``/BaseState /OFF`` everything in /OCGs not listed /ON is hidden;
    otherwise exactly the groups listed /OFF."""
    ocp = doc.resolve(doc.catalog.get("OCProperties", NULL))
    if not isinstance(ocp, dict):
        return frozenset()
    d = doc.resolve(ocp.get("D", NULL))
    if not isinstance(d, dict):
        return frozenset()

    def refs_of(src: dict, key: str) -> set:
        arr = doc.resolve(src.get(key, NULL))
        if not isinstance(arr, list):
            return set()
        return {x for x in arr if isinstance(x, Ref)}

    if doc.resolve(d.get("BaseState", NULL)) == Name("OFF"):
        return frozenset(refs_of(ocp, "OCGs") - refs_of(d, "ON"))
    return frozenset(refs_of(d, "OFF"))


def oc_is_hidden(doc, raw_oc, hidden: frozenset) -> bool:
    """Visibility of an ``/OC`` entry (kept UNRESOLVED by the caller so
    ref identity survives): an OCG ref is hidden iff listed; an OCMD is
    hidden iff it has members and — per the default /AnyOn policy —
    every member OCG is hidden."""
    if isinstance(raw_oc, Ref) and raw_oc in hidden:
        return True
    obj = doc.resolve(raw_oc)
    if (
        isinstance(obj, dict)
        and doc.resolve(obj.get("Type", NULL)) == Name("OCMD")
    ):
        m = obj.get("OCGs", NULL)
        rm = doc.resolve(m)
        if isinstance(rm, list):
            refs = [x for x in rm if isinstance(x, Ref)]
        elif isinstance(m, Ref) and isinstance(rm, dict):
            refs = [m]
        else:
            refs = []
        return bool(refs) and all(r in hidden for r in refs)
    return False
