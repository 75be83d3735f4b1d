"""End-to-end pipeline assembly (stage graphs over the corpus table)."""
