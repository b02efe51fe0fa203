"""Entity-name scalar functions.

Parity: ``src/utils/toCamelCase.ts:1-3`` (lower-case the first
character) and ``src/utils/pluralizeEntityName.ts:11-16``
(``y -> ies`` else ``+s``, camel-cased) — the GraphQL root-field
naming convention of The Graph's generated schemas.
"""

from __future__ import annotations


def to_camel_case(name: str) -> str:
    if not name:
        return name
    return name[0].lower() + name[1:]


def pluralize_entity_name(name: str) -> str:
    # unconditional y->ies (parity with the reference; The Graph's
    # schema generator does the same for these entities)
    if name.endswith("y"):
        return to_camel_case(name[:-1]) + "ies"
    return to_camel_case(name) + "s"
