"""Label standardization / flag propagation / size reclassification
(SURVEY.md §2.2 P15-P17).

Semantics from the reference (behavior only, re-expressed as native
column expressions):
- P15 label map: src/form_calcs.py:322-334 ``object_dict`` — 20 raw
  variants -> 7 canonical classes. The reference raises KeyError on an
  unknown label (src/form_calcs.py:344); the engine instead maps
  unknowns to NULL and exposes a ``coalesce``-guarded variant, per
  SURVEY §7 (intended behavior, divergence documented).
- P16 flag propagation: src/form_calcs.py:345-350 — difficult==1 or
  truncated==1 forces BOTH flags to 1.
- P17 15-px reclassification: src/form_calcs.py:387-415 — on clean
  boxes (difficult=0 and truncated=0), closed_roof_tank with width<=15
  or height<=15 becomes narrow_closed_roof_tank and vice versa. (The
  reference computes this but never writes it back — a latent no-op;
  we implement the intended rule.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

CANONICAL_CLASSES = (
    "closed_roof_tank",
    "narrow_closed_roof_tank",
    "external_floating_roof_tank",
    "sedimentation_tank",
    "water_tower",
    "undefined_object",
    "spherical_tank",
)

# raw variant -> canonical class (src/form_calcs.py:322-334, verbatim keys)
OBJECT_DICT: dict[str, str] = {
    "closed_roof_tank": "closed_roof_tank",
    "closed_roof_tank ": "closed_roof_tank",
    "closed roof tank": "closed_roof_tank",
    "narrow_closed_roof_tank": "narrow_closed_roof_tank",
    "external_floating_roof_tank": "external_floating_roof_tank",
    "external floating roof tank": "external_floating_roof_tank",
    "external_floating_roof_tank ": "external_floating_roof_tank",
    "external_closed_roof_tank": "external_floating_roof_tank",
    "water_treatment_tank": "sedimentation_tank",
    "water_treatment_tank ": "sedimentation_tank",
    "water_treatment_plant": "sedimentation_tank",
    "water_treatment_facility": "sedimentation_tank",
    "water_tower": "water_tower",
    "water_tower ": "water_tower",
    "water_towe": "water_tower",
    "spherical_tank": "spherical_tank",
    "sphere": "spherical_tank",
    "spherical tank": "spherical_tank",
    "undefined_object": "undefined_object",
    "unknown_object": "undefined_object",
    "silo": "undefined_object",
}


def standardize_label(raw: Column, unknown_to: str | None = None) -> Column:
    """P15: map a raw label to its canonical class.

    Unknown labels become NULL (or ``unknown_to`` if given) — the
    engine's guard for the reference's KeyError behavior.
    """
    mapping = F.create_map(*[F.lit(x) for kv in OBJECT_DICT.items() for x in kv])
    # column-keyed lookup; try_element_at is NULL-on-missing under ANSI
    # (getItem(col) is deprecated, element_at may throw in future ANSI)
    out = F.try_element_at(mapping, raw)
    if unknown_to is not None:
        out = F.coalesce(out, F.lit(unknown_to))
    return out


def standardize_label_sql(raw_expr: str, unknown_to: str | None = None) -> str:
    """DuckDB oracle text for ``standardize_label``."""
    whens = "\n    ".join(
        f"WHEN {raw_expr} = '{k}' THEN '{v}'" for k, v in OBJECT_DICT.items()
    )
    default = f"'{unknown_to}'" if unknown_to is not None else "NULL"
    return f"(CASE\n    {whens}\n    ELSE {default} END)"


def propagate_flags(truncated: Column, difficult: Column) -> tuple[Column, Column]:
    """P16: either flag set forces both to 1."""
    either = (truncated == 1) | (difficult == 1)
    one = F.when(either, F.lit(1)).otherwise(F.lit(0))
    return one, one


def propagate_flags_sql(trunc_expr: str, diff_expr: str) -> str:
    return f"(CASE WHEN {trunc_expr} = 1 OR {diff_expr} = 1 THEN 1 ELSE 0 END)"


def reclassify_by_size(
    name: Column,
    truncated: Column,
    difficult: Column,
    width: Column,
    height: Column,
    threshold: int = 15,
) -> Column:
    """P17: narrow<->closed roof tank reclassification on clean boxes.

    The reference applies its two ``if``s SEQUENTIALLY (not elif,
    src/form_calcs.py:404-413): a closed_roof_tank with exactly one
    dim <= 15 is flipped to narrow and immediately flipped back. Net
    semantics: closed -> narrow only when BOTH dims <= threshold;
    narrow -> closed when ANY dim > threshold.
    """
    clean = (truncated == 0) & (difficult == 0)
    both_small = (width <= threshold) & (height <= threshold)
    any_big = (width > threshold) | (height > threshold)
    return (
        F.when(clean & (name == "closed_roof_tank") & both_small, "narrow_closed_roof_tank")
        .when(clean & (name == "narrow_closed_roof_tank") & any_big, "closed_roof_tank")
        .otherwise(name)
    )


def reclassify_by_size_sql(
    name: str, trunc: str, diff: str, width: str, height: str, threshold: int = 15
) -> str:
    return f"""(CASE
    WHEN {trunc} = 0 AND {diff} = 0 AND {name} = 'closed_roof_tank'
         AND ({width} <= {threshold} AND {height} <= {threshold})
      THEN 'narrow_closed_roof_tank'
    WHEN {trunc} = 0 AND {diff} = 0 AND {name} = 'narrow_closed_roof_tank'
         AND ({width} > {threshold} OR {height} > {threshold})
      THEN 'closed_roof_tank'
    ELSE {name} END)"""
