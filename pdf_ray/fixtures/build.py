"""Regenerate the committed fixture corpus: ``python -m pdf_ray.fixtures.build``."""

from .tables import write_corpus

if __name__ == "__main__":
    n = write_corpus("fixtures_data", replicas=5)
    print(f"wrote fixtures_data/ ({n} docs)")
