"""Broadcastable wordlists for the lexical scrub tier and keep/drop rules.

The reference resolves lexical PII (names, cities, streets) with an LLM
(reference: redactor.py:32-41); our corpus-scale equivalent is gazetteer
lookup: small dictionaries shipped to executors (closure-captured here;
``sc.broadcast`` for large lists on a real cluster) matched with the same
boundary-guarded case-sensitive semantics as the per-url fixture gazetteer.

These lists are deliberately small and deterministic — they exist to make
the *plumbing* (broadcast join shape, span resolution, keep/drop decision)
real and testable, not to be an exhaustive name dictionary. A production
deployment swaps in full census/GeoNames lists via the same interface.
"""

from __future__ import annotations

GIVEN_NAMES = [
    "John", "Alice", "Bob", "Carol", "David", "Emma", "Frank", "Grace",
    "Henry", "Irene", "Jack", "Karen", "Liam", "Mary", "Noah", "Olivia",
    "Peter", "Quinn", "Rachel", "Steve", "Tina", "Victor", "Wendy", "Yusuf",
    "Zoe", "Ahmed", "Chen", "Diego", "Fatima", "Hiroshi", "Ingrid", "Jorge",
    "Katya", "Luca", "Mei", "Nadia", "Omar", "Priya", "Ravi", "Sofia",
]

SURNAMES = [
    "Smith", "Brown", "Davis", "Johnson", "Williams", "Jones", "Miller",
    "Wilson", "Moore", "Taylor", "Anderson", "Thomas", "Jackson", "White",
    "Harris", "Martin", "Thompson", "Garcia", "Martinez", "Robinson",
    "Clark", "Rodriguez", "Lewis", "Lee", "Walker", "Hall", "Allen",
    "Young", "Hernandez", "King", "Wright", "Lopez", "Hill", "Scott",
    "Green", "Adams", "Baker", "Nelson", "Carter", "Mitchell",
]

CITIES = [
    "Portland", "Seattle", "Austin", "Denver", "Boston", "Chicago",
    "Houston", "Phoenix", "Dallas", "Atlanta", "Miami", "Detroit",
    "London", "Bristol", "Brighton", "Manchester", "Leeds", "Glasgow",
    "Paris", "Berlin", "Madrid", "Amsterdam", "Dublin", "Toronto",
]

US_STATE_CODES = [
    "AL", "AK", "AZ", "AR", "CA", "CO", "CT", "DE", "FL", "GA", "HI", "ID",
    "IL", "IN", "IA", "KS", "KY", "LA", "ME", "MD", "MA", "MI", "MN", "MS",
    "MO", "MT", "NE", "NV", "NH", "NJ", "NM", "NY", "NC", "ND", "OH", "OK",
    "OR", "PA", "RI", "SC", "SD", "TN", "TX", "UT", "VT", "VA", "WA", "WV",
    "WI", "WY",
]

COUNTRIES = [
    "United States", "United Kingdom", "Canada", "Australia", "Germany",
    "France", "Spain", "Italy", "Netherlands", "Ireland", "Mexico", "Brazil",
    "India", "China", "Japan",
]

# Honorifics (ai4privacy TITLE class). Dotted forms first: gazetteer
# dedup is first-label-wins and a dotted match ("Mr.") is longer, so at
# equal start the longer span wins overlap resolution anyway.
TITLES = [
    "Mr.", "Mrs.", "Ms.", "Dr.", "Prof.", "Mx.",
    "Mr", "Mrs", "Ms", "Dr", "Prof", "Mx", "Miss", "Sir", "Madam",
]

# Gender words (ai4privacy SEX class). Case-sensitive variants listed
# explicitly; boundary guards stop "male" matching inside "female".
SEX_WORDS = [
    "male", "female", "Male", "Female", "MALE", "FEMALE",
    "non-binary", "Non-binary",
]

# Placeholder toxicity wordlist for the keep/drop decision — deterministic
# sentinel tokens so tests can inject hits without embedding real slurs in
# the repo. A production deployment swaps in a curated list (same interface).
TOXICITY_WORDS = [
    "tox_slur_a", "tox_slur_b", "tox_profanity_a", "tox_profanity_b",
    "tox_nsfw_a", "tox_nsfw_b",
]


def global_scrub_gazetteer() -> list[tuple[str, str]]:
    """(value, label) pairs for the corpus-wide lexical scrub tier.

    Name entries carry the family's first ordinal; the scrub kernel
    re-numbers per document (GIVENNAME2, LASTNAME2/3) by order of first
    occurrence (kernels/scrub.py:_assign_name_ordinals)."""
    pairs: list[tuple[str, str]] = []
    pairs += [(n, "GIVENNAME1") for n in GIVEN_NAMES]
    pairs += [(n, "LASTNAME1") for n in SURNAMES]
    pairs += [(c, "CITY") for c in CITIES]
    pairs += [(s, "STATE") for s in US_STATE_CODES]
    pairs += [(c, "COUNTRY") for c in COUNTRIES]
    pairs += [(t, "TITLE") for t in TITLES]
    pairs += [(w, "SEX") for w in SEX_WORDS]
    return pairs
