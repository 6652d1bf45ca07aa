"""placeholder — filled in this round."""
QUERIES = {}
ORACLES = {}
