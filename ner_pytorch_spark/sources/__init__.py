"""File-format scans: CoNLL token files, GloVe vectors, PPDB rows."""
