from .reference_oracle import oracle_extract_corpus, oracle_triples

__all__ = ["oracle_extract_corpus", "oracle_triples"]
