from .build_graph import build_graph, concept_triples, triples_with_key  # noqa: F401
