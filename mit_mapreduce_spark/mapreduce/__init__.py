"""MapReduce compatibility facade."""
