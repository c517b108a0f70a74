"""Published Gopher filter-rule constants (Rae et al. 2021, Table A1)
— the SINGLE SOURCE OF TRUTH shared by the Column-expression surface
(`operators/text.py`) and the SQL-text twin (`functions/sql_text.py`).

A dedicated leaf module (ADVICE r10): previously `sql_text.py` imported
`operators/text.py` at module import time just for these tables, which
inverted the lightweight-SQL-surface layering and risked a circular
import if the operators ever needed the SQL registry. This module
imports NOTHING from the package, so any surface can depend on it.

Both surfaces re-export these names unchanged, so existing imports
(`from postgresql_topn_spark.operators.text import GOPHER_STOPWORDS`)
keep working.
"""

# Gopher's 8-word stopword list (the/be/to/of/and/that/have/with);
# the quality rule requires >= 2 DISTINCT hits.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

# Quality-rule bounds (Table A1, first half). A document is REMOVED
# when a signal falls outside its bound; `passes` is the AND.
GOPHER_QUALITY_BOUNDS = {
    "n_words_min": 50,
    "n_words_max": 100_000,
    "mean_word_len_min": 3.0,
    "mean_word_len_max": 10.0,
    "symbol_word_ratio_max": 0.1,
    "bullet_line_frac_max": 0.9,
    "ellipsis_line_frac_max": 0.3,
    "alpha_word_frac_min": 0.8,
    "n_stop_hits_min": 2,
}

# Repetition-rule thresholds (Table A1, second half): max char
# fraction in the top n-gram, and max char fraction in duplicated
# n-grams, per n.
GOPHER_TOP_NGRAM_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_DUP_NGRAM_MAX = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}
