"""Sources: MMS flat-file CSV dialect (reference parity) + zip containers."""
