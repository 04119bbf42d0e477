"""
Remove phasing information from a VCF file

This script removes all types of phasing information from the input VCF and
prints out the modified VCF to standard output. The modifications are:

- The HP, PS and PQ tags are removed
- Phasing in the GT tag (using pipe notation) is removed. The genotypes are
  sorted in ascending order. For example, a GT value of '1|0' is converted
  to '0/1'.

It is not an error if no phasing information was found.
"""

import logging
import sys

from ..io.vcflib import VariantFile

logger = logging.getLogger(__name__)

TAGS_TO_REMOVE = frozenset(("HP", "PQ", "PS"))


def add_arguments(parser):
    add = parser.add_argument
    add("vcf", metavar="VCF", help='VCF file. Use "-" to read from standard input')


def unphase_header(header):
    header.remove_meta_key("phasing")
    for tag in TAGS_TO_REMOVE:
        if tag in header.formats:
            header.remove_format(tag)


def run_unphase(vcf_path, outfile):
    """Read a VCF, remove phasing information, write the result to outfile."""
    if vcf_path == "-":
        reader = VariantFile(sys.stdin)
    else:
        reader = VariantFile(vcf_path)

    unphase_header(reader.header)
    with VariantFile(outfile, mode="w", header=reader.header) as writer:
        for record in reader:
            record.format = [tag for tag in record.format if tag not in TAGS_TO_REMOVE]
            for call in record.samples.values():
                for tag in TAGS_TO_REMOVE:
                    if tag in call:
                        del call[tag]
                gt = call["GT"] if "GT" in call._values else None
                if gt is not None and len(gt) >= 2 and gt[0] is not None and gt[1] is not None:
                    call["GT"] = tuple(sorted(gt))
                call.phased = False
            writer.write(record)


def main(args):
    run_unphase(args.vcf, sys.stdout)
