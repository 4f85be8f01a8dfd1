"""Experimental features (reference ``trieste/experimental``)."""
