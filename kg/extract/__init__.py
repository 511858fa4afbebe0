from kg.extract.extractors import extract_triples  # noqa: F401
from kg.extract.jvm import triples_from_source_jvm  # noqa: F401
from kg.extract.stage import run_extract, triples_from_source  # noqa: F401
