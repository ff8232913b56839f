"""URL-frontier engine: datagen, span extraction, seen-set, scheduler, rounds."""
