"""gooselite — pure-Python re-implementation of the Goose article-extraction
algorithm (the algorithm of rniice/node-goose, per BASELINE.json:6).

Design contract (SURVEY.md §2.2 / §7.2):
  * zero non-stdlib dependencies (``charset_normalizer`` optional);
  * NO Spark imports anywhere in this package — it is vendored into the
    ``spark-submit --py-files`` zip and imported once per Python worker;
  * all fidelity-critical scoring constants live in ``constants.py``
    (SURVEY.md §2.4) and must be re-verified against /root/reference the
    moment it is non-empty (it was EMPTY at build time, SURVEY.md §0.1).

Public API: :func:`gooselite.pipeline.extract_one`.
"""

from gooselite.pipeline import extract_one  # noqa: F401

__all__ = ["extract_one"]
__version__ = "0.1.0"
