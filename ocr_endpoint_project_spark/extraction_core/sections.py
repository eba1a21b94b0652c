"""Deterministic structured-parse stage (replaces the reference's LLM stage).

The reference turns extracted resume text into a fixed nested JSON record
via a remote LLM (``cv_api/pipeline.py:162-229``) validated against
``RESUME_EXTRACTION_SCHEMA`` (``cv_api/resume_schema.py:11-131``). Remote
models are non-deterministic and unavailable here, so the stage is
replaced by a header-driven section segmenter with the SAME output schema
and error taxonomy: ALL-CAPS lines (the same shape ``layout_accuracy``
treats as section headers, ``ocr_common.py:152-166``) open sections, and
line grammars inside each section fill the nested record.

Section grammar (the corpus generator emits documents in this shape):

    NAME: <name>                    scalar fields as "KEY: value" lines
    LOCATION: <location>
    ABOUT                           free paragraph until next header
    EXPERIENCE                      "- position | institution | from | to"
    EDUCATION                       "- degree | institution | from | to"
    SKILLS                          "- category: item1, item2"
    PROJECTS                        "- name | role | tech1, tech2"
    INTERESTS / ACCOMPLISHMENTS / CONTACTS    "- item" lines
"""

from __future__ import annotations

import json

# the nested record's field inventory (re-expression of
# cv_api/resume_schema.py:11-131; structural parity checked in tests)
SCALAR_FIELDS = ("linkedin_url", "name", "location", "about", "open_to_work")
LIST_SECTIONS = {
    "INTERESTS": "interests",
    "ACCOMPLISHMENTS": "accomplishments",
    "CONTACTS": "contacts",
}
EXPERIENCE_KEYS = (
    "position_title",
    "institution_name",
    "linkedin_url",
    "from_date",
    "to_date",
    "duration",
    "location",
    "description",
)
EDUCATION_KEYS = (
    "degree",
    "institution_name",
    "linkedin_url",
    "from_date",
    "to_date",
    "duration",
    "location",
    "description",
)
PROJECT_KEYS = (
    "project_name",
    "role",
    "from_date",
    "to_date",
    "duration",
    "technologies",
    "description",
    "url",
)

ERR_PARSING_JSON_INVALID = "PARSING_JSON_INVALID"
ERR_SCHEMA_VALIDATION = "PARSING_SCHEMA_VALIDATION_FAILED"


def empty_record() -> dict:
    return {
        "linkedin_url": None,
        "name": None,
        "location": None,
        "about": None,
        "open_to_work": None,
        "experiences": [],
        "educations": [],
        "skills": [],
        "projects": [],
        "interests": [],
        "accomplishments": [],
        "contacts": [],
    }


def _entry(keys: tuple[str, ...], **values) -> dict:
    d = {k: None for k in keys}
    if "technologies" in keys:
        d["technologies"] = []
    d.update(values)
    return d


def _split_pipes(body: str) -> list[str]:
    return [p.strip() for p in body.split("|")]


def section_record(text: str | None) -> dict:
    """Segment extracted text into the nested resume-style record."""
    rec = empty_record()
    section = None
    about_lines: list[str] = []
    for raw in (text or "").splitlines():
        ln = raw.strip()
        if not ln:
            continue
        upper = ln.isupper() and any(c.isalpha() for c in ln)
        if upper and ":" not in ln:
            section = ln.split()[0] if ln.split() else None
            continue
        if ln.upper().startswith("NAME:"):
            rec["name"] = ln[5:].strip() or None
            continue
        if ln.upper().startswith("LOCATION:") and section is None:
            rec["location"] = ln[9:].strip() or None
            continue
        if ln.upper().startswith("LINKEDIN:"):
            rec["linkedin_url"] = ln[9:].strip() or None
            continue
        if ln.upper().startswith("OPEN TO WORK:"):
            rec["open_to_work"] = ln.split(":", 1)[1].strip().lower() == "yes"
            continue
        if section == "ABOUT":
            about_lines.append(ln)
        elif section == "EXPERIENCE" and ln.startswith("- "):
            parts = _split_pipes(ln[2:])
            rec["experiences"].append(
                _entry(
                    EXPERIENCE_KEYS,
                    position_title=parts[0] if parts else "",
                    institution_name=parts[1] if len(parts) > 1 else "",
                    from_date=parts[2] if len(parts) > 2 else None,
                    to_date=parts[3] if len(parts) > 3 else None,
                )
            )
        elif section == "EDUCATION" and ln.startswith("- "):
            parts = _split_pipes(ln[2:])
            rec["educations"].append(
                _entry(
                    EDUCATION_KEYS,
                    degree=parts[0] if parts else "",
                    institution_name=parts[1] if len(parts) > 1 else "",
                    from_date=parts[2] if len(parts) > 2 else None,
                    to_date=parts[3] if len(parts) > 3 else None,
                )
            )
        elif section == "SKILLS" and ln.startswith("- "):
            body = ln[2:]
            cat, _, items = body.partition(":")
            rec["skills"].append(
                {
                    "category": cat.strip(),
                    "items": [i.strip() for i in items.split(",") if i.strip()],
                }
            )
        elif section == "PROJECTS" and ln.startswith("- "):
            parts = _split_pipes(ln[2:])
            rec["projects"].append(
                _entry(
                    PROJECT_KEYS,
                    project_name=parts[0] if parts else "",
                    role=parts[1] if len(parts) > 1 else None,
                    technologies=(
                        [t.strip() for t in parts[2].split(",") if t.strip()]
                        if len(parts) > 2
                        else []
                    ),
                )
            )
        elif section in LIST_SECTIONS and ln.startswith("- "):
            rec[LIST_SECTIONS[section]].append(ln[2:].strip())
    if about_lines:
        rec["about"] = " ".join(about_lines)
    return rec


def section_record_json(text: str | None) -> str:
    """JSON-string variant for the vectorized kernel feeding ``from_json``."""
    return json.dumps(
        section_record(text), ensure_ascii=False, separators=(",", ":"), sort_keys=True
    )


def validate_record(rec: dict) -> tuple[bool, str | None]:
    """Structural validation mirroring the reference's strict check
    (``cv_api/resume_schema.py:201-213``): all top-level keys present,
    list fields are lists, struct entries carry their required keys."""
    expected = empty_record()
    missing = [k for k in expected if k not in rec]
    if missing:
        return False, f"{ERR_SCHEMA_VALIDATION}: missing keys {missing}"
    for key, keys in (
        ("experiences", EXPERIENCE_KEYS),
        ("educations", EDUCATION_KEYS),
        ("projects", PROJECT_KEYS),
    ):
        if not isinstance(rec[key], list):
            return False, f"{ERR_SCHEMA_VALIDATION}: {key} not a list"
        for item in rec[key]:
            if not isinstance(item, dict) or any(k not in item for k in keys):
                return False, f"{ERR_SCHEMA_VALIDATION}: bad {key} entry"
    for key in ("skills", "interests", "accomplishments", "contacts"):
        if not isinstance(rec[key], list):
            return False, f"{ERR_SCHEMA_VALIDATION}: {key} not a list"
    return True, None
