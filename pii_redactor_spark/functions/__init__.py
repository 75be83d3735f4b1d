"""Column-expression builders and broadcastable dictionaries (label
vocabulary, gazetteers, wordlists, quality-rule expressions)."""
