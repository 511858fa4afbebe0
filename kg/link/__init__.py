from kg.link.stage import (  # noqa: F401
    candidate_pairs,
    mentions_from_triples,
    run_link,
    score_pairs,
)
