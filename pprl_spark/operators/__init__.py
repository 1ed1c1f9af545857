"""Pipeline operators: normalize, embed, block, score, match, cluster."""
