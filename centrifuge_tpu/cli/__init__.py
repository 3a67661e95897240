"""Drop-in command-line tools mirroring the reference CLI surface:

  centrifuge          classification driver   (centrifuge.cpp + Perl wrapper)
  centrifuge-build    index builder           (centrifuge_build.cpp)
  centrifuge-inspect  index inspection        (centrifuge_inspect.cpp)
  centrifuge-kreport  Kraken-style report     (centrifuge-kreport Perl)
  centrifuge-download DB/taxonomy fetcher     (centrifuge-download Bash)
  centrifuge-promote  taxID rank promotion    (centrifuge-promote Perl)

Invoke via the bin/ scripts or `python -m centrifuge_tpu <tool> ...`.
"""
