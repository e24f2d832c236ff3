"""Regenerate the committed fixture corpus: ``python -m pdf_ray.fixtures.build``."""

from .htmlcorpus import HTML_REPLICAS, write_html_corpus
from .tables import DEFAULT_REPLICAS, write_corpus

if __name__ == "__main__":
    n = write_corpus("fixtures_data", replicas=DEFAULT_REPLICAS)
    h = write_html_corpus("fixtures_data", replicas=HTML_REPLICAS)
    print(f"wrote fixtures_data/ ({n} pdf docs, {h} html docs)")
