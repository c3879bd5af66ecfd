"""Ray Data batch stages: canonicalize, fetch+parse, decode, transforms."""
