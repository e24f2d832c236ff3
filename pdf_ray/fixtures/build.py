"""Regenerate the committed fixture corpus: ``python -m pdf_ray.fixtures.build``."""

from .tables import DEFAULT_REPLICAS, write_corpus

if __name__ == "__main__":
    n = write_corpus("fixtures_data", replicas=DEFAULT_REPLICAS)
    print(f"wrote fixtures_data/ ({n} docs)")
