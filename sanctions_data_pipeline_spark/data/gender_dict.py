"""Built-in first-name -> gender dictionary (engine data).

The reference uses the gender-guesser package's dictionary
(main.py:541,780-787). This engine ships its own compact public-domain
name list with the same lookup semantics: case-insensitive first-token
match, 'female' wins only on an explicit female entry, everything else
resolves Male (main.py:784).
"""

from __future__ import annotations

FEMALE_NAMES = [
    "aisha", "amina", "ana", "anna", "carmen", "elena", "emma", "fatima",
    "hana", "irina", "isabel", "jamila", "julia", "khadija", "laila",
    "laura", "leila", "lucia", "malika", "maria", "mariam", "marina",
    "marta", "maryam", "monica", "nadia", "natalia", "nour", "olga",
    "rania", "sara", "sarah", "sofia", "sonia", "svetlana", "tatiana",
    "vera", "yasmin", "zahra", "zeinab",
]

MALE_NAMES = [
    "abdul", "ahmad", "ahmed", "alexander", "ali", "andrei", "anton",
    "boris", "carlos", "david", "dmitri", "hassan", "hussein", "ibrahim",
    "igor", "ivan", "jamal", "john", "jose", "juan", "karim", "khalid",
    "luis", "mahmoud", "marco", "mikhail", "mohamed", "mohammad",
    "mohammed", "mustafa", "nikolai", "omar", "pavel", "pedro", "peter",
    "rashid", "said", "salim", "samir", "sergei", "tariq", "umar",
    "viktor", "vladimir", "yuri", "yusuf",
]

# Reference forced-male title / pattern lists (main.py:369-377)
MALE_TITLES = [
    "mullah", "maulavi", "mawlavi", "moulavi", "molvi", "qari", "ustad",
    "imam", "amir", "haji", "hajji", "agha", "khan", "pir", "sardar",
    "sayed", "sayyid", "syed", "janan agha",
]
MALE_NAME_PATTERNS = [
    "gul ahmad", "gul ahmed", "abdul", "mohammad", "mohammed", "rahman",
    "hakim", "hakimi", "ullah", "uddin", "ishakzai", "noorzai", "zai",
]


def rows() -> list[tuple[str, str]]:
    """Merged dictionary: compact base lists + the extended
    international lists (gender_names_ext + gender_names_ext2) + the
    round-6 bulk lists (gender_names_bulk, ~6k), deduplicated with
    male-wins-conflict. Male-wins preserves the reference's resolution
    for ambiguous names (main.py:784: Female only on an explicit
    female entry, everything else Male), and a single row per name
    keeps the broadcast dictionary join from fanning out.

    Precedence: the hand-curated ext/ext2 judgments stand (they
    predate the bulk import and were reviewed case by case); the BULK
    lists (round-6 wave + the round-7 gender_names_bulk2 wave) are
    additionally screened through AMBIGUOUS_EXCLUDE, and a bulk-male
    entry never flips an ext-female one (nor vice versa) — each bulk
    wave can only ADD names, not re-gender previously reviewed ones;
    the round-7 wave likewise cannot re-gender a round-6 entry."""
    from sanctions_data_pipeline_spark.data import gender_names_bulk as blk
    from sanctions_data_pipeline_spark.data import gender_names_bulk2 as blk2
    from sanctions_data_pipeline_spark.data import gender_names_ext as ext
    from sanctions_data_pipeline_spark.data import gender_names_ext2 as ext2

    male_prev = set(MALE_NAMES) | set(ext.MALE_EXT)
    female_prev = (set(FEMALE_NAMES) | set(ext.FEMALE_EXT)
                   | set(ext2.FEMALE_EXT2)) - male_prev
    screen = set(blk.AMBIGUOUS_EXCLUDE)
    male = male_prev | (set(blk.MALE_BULK) - screen - female_prev)
    female = (female_prev
              | (set(blk.FEMALE_BULK) - screen - male_prev)) - male
    # round-7 wave: same discipline, one precedence level lower
    male = male | (set(blk2.MALE_BULK2) - screen - female)
    female = (female | (set(blk2.FEMALE_BULK2) - screen - male)) - male
    return sorted([(n, "female") for n in female]
                  + [(n, "male") for n in male])


def sql_values() -> str:
    """DuckDB VALUES list: (name, gender)."""
    vals = ", ".join(f"('{n}', '{g}')" for n, g in rows())
    return f"(VALUES {vals})"


def forced_male_regex() -> str:
    """Substring-containment pattern over the lowercased name
    (reference checks `t in n`, main.py:380-390)."""
    pats = sorted(set(MALE_TITLES + MALE_NAME_PATTERNS))
    return "(" + "|".join(pats) + ")"
