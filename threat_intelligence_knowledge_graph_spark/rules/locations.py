"""Nationality → nation knowledge base (broadcast dimension).

The reference reads ``nationalities.csv`` from its absent submodule
(reference ner_extractor.py:98-106) and silently degrades to an empty KB.
Schema is inferred from the column accesses ``row['Nationality']`` /
``row['Nation']`` (reference ner_extractor.py:188-192). We vendor a pinned
~35-row KB so the Location operator is actually exercised. Row order is the
scan order (reference iterates ``df.iterrows()``, ner_extractor.py:185);
nationalities shorter than 4 chars are skipped by the operator
(ner_extractor.py:194-196), matching is case-insensitive substring against
the RAW document text (ner_extractor.py:181-199).
"""

# (nationality_lowercase, nation)
NATIONALITY_KB: list[tuple[str, str]] = [
    ("american", "United States"),
    ("australian", "Australia"),
    ("belarusian", "Belarus"),
    ("brazilian", "Brazil"),
    ("british", "United Kingdom"),
    ("canadian", "Canada"),
    ("chinese", "China"),
    ("czech", "Czechia"),
    ("dutch", "Netherlands"),
    ("egyptian", "Egypt"),
    ("finnish", "Finland"),
    ("french", "France"),
    ("german", "Germany"),
    ("indian", "India"),
    ("iranian", "Iran"),
    ("iraqi", "Iraq"),
    ("israeli", "Israel"),
    ("italian", "Italy"),
    ("japanese", "Japan"),
    ("korean", "South Korea"),
    ("lebanese", "Lebanon"),
    ("mexican", "Mexico"),
    ("north korean", "North Korea"),
    ("norwegian", "Norway"),
    ("pakistani", "Pakistan"),
    ("polish", "Poland"),
    ("romanian", "Romania"),
    ("russian", "Russia"),
    ("saudi", "Saudi Arabia"),
    ("spanish", "Spain"),
    ("swedish", "Sweden"),
    ("syrian", "Syria"),
    ("turkish", "Turkey"),
    ("ukrainian", "Ukraine"),
    ("vietnamese", "Vietnam"),
]
