"""NLP side-module (parity tier for the reference's ``nlp/``)."""
