"""HTML main-content extraction (boilerplate strip over DOM heuristics).

The north rule's main-content pipeline covers "HTML boilerplate strip,
PDF/layout parse, DOM heuristics"; the PDF half lives in ``pdfcore``, this
package is the HTML half. Built from scratch: a WHATWG-shaped tokenizer
(``tokenizer.py``) and a deterministic boilerpipe/readability-style block
classifier (``boiler.py``). No external parser libraries; entity decoding
uses the stdlib ``html.unescape`` table only.
"""

from .boiler import extract_main_content  # noqa: F401
