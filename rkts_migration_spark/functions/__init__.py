"""Scalar function surface: pure Catalyst column expressions wherever
possible (JVM-side, whole-stage-codegen'd); pandas UDFs only for the
few genuinely procedural functions (EWTS shad, location grammar,
language guess) — the slow-path discipline from SURVEY.md §2.10."""

from .ids import (  # noqa: F401
    pad_id_col,
    conv_iri_col,
    turn_iri_col,
    section_iri_col,
    entity_iri_col,
    int_lit_col,
)
from .text import (  # noqa: F401
    nt_escape_col,
    str_lit_col,
    norm_surface_col,
    norm_label_col,
    nt_line_col,
    add_shad,
    guess_lang,
)
