"""Deterministic synthetic corpus generation (no external data).

Analogue of the reference's vendored Random3Dcity generators
(/root/reference/randomiseCity.py:92-116, generateCityGML.py) reduced to the
five roof archetypes used there (randomiseCity.py:125): flat, shed, gabled,
hipped, pyramidal.  Everything is a pure function of the integer document key,
so the corpus is bit-reproducible and every derived quantity has a closed form
that an ANSI-SQL oracle can recompute.
"""

from datagen.buildings import (  # noqa: F401
    building_params,
    build_mesh,
    mesh_to_span_text,
    doc_spans,
    HASH_A,
    HASH_B,
)
