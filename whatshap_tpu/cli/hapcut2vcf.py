"""
Convert hapCUT output format to VCF

HapCUT’s output is combined with the original VCF and
then written as phased VCF to standard output.

HapCUT 1 and 2 are supported.

HapCUT’s output file format is explained at
<https://github.com/vibansal/hapcut#format-of-input-and-output-files>

HapCUT2’s output format is documented at
<https://github.com/pjedge/hapcut2#output-format>
"""

import itertools
import logging
import re
import sys
from collections import namedtuple
from contextlib import ExitStack

from .. import __version__
from ..core import Read
from ..vcf import PhasedVcfWriter
from . import CommandLineError

logger = logging.getLogger(__name__)


def add_arguments(parser):
    add = parser.add_argument
    add(
        "-o",
        "--output",
        default=sys.stdout,
        help="Output VCF file. If omitted, use standard output.",
    )
    add("vcf", metavar="VCF", help="VCF file")
    add("hapcut", metavar="HAPCUT-RESULT", help="hapCUT result file")


HapCutVariant = namedtuple(
    "HapCutVariant", ["chromosome", "position", "haplotype1", "haplotype2", "component_id"]
)


class ParseError(Exception):
    pass


class HapCutParser:
    """Parse HapCUT (1 or 2) result files: BLOCK headers followed by variant
    lines, blocks terminated by '********'."""

    block_re = re.compile(
        r"BLOCK: "
        r"offset: (?P<offset>\d+) "
        r"len: (?P<len>\d+) "
        r"phased: (?P<phased>\d+) "
        r"SPAN: (?P<span>\d+) "
        r"(MECscore (?P<mecscore>\d+\.\d+) )?fragments (?P<fragments>\d+)"
    )

    def __init__(self, file):
        self._file = file

    def __iter__(self):
        """Yield (chromosome, blocks) pairs"""
        yield from self._by_chromosome()

    def parse_blocks(self):
        """Yield a list of HapCutVariant objects per connected component."""
        state = "BLOCK"  # what we expect next
        block = []
        for line in self._file:
            if state == "BLOCK":
                state = "VARIANT"
                if not line.startswith("BLOCK:"):
                    raise ParseError('Expected a new block (line starting with "BLOCK:")')
                m = self.block_re.match(line)
                if not m:
                    raise ParseError("BLOCK line malformed")
            elif state == "VARIANT":
                if line.startswith("********"):
                    if block:
                        yield block
                    state = "BLOCK"
                    block = []
                else:
                    fields = line.strip().split()
                    if len(fields) not in (9, 11):
                        raise ParseError(
                            "Expected nine fields (for hapCUT 1) "
                            "or eleven fields (for hapCUT 2) in variant line"
                        )
                    (
                        variant_id,
                        haplotype_1,
                        haplotype_2,
                        chromosome,
                        position,
                        reference_allele,
                        alternative_allele,
                        genotype,
                    ) = fields[:8]

                    if len(fields) == 9:  # hapCUT 1: validate the last field
                        rest = fields[8]
                        fields = rest.split(":")
                        if len(fields) == 5:
                            if not fields[-1] == "FV":
                                raise ParseError('Expected "FV" after last colon')
                            fields = fields[:-1]
                        if not len(fields) == 4:
                            raise ParseError("Too few elements in last (colon-separated) field")
                    if haplotype_1 == "-" or haplotype_2 == "-":
                        # happens in hapCUT 2 sometimes
                        continue
                    _ = int(variant_id)
                    haplotype_1 = int(haplotype_1)
                    haplotype_2 = int(haplotype_2)
                    position = int(position) - 1
                    component_id = block[0].position if block else position
                    variant = HapCutVariant(
                        chromosome, position, haplotype_1, haplotype_2, component_id
                    )
                    block.append(variant)
        if len(block) > 0:
            yield block

    def _by_chromosome(self):
        for chromosome, block in itertools.groupby(self.parse_blocks(), lambda b: b[0].chromosome):
            yield chromosome, list(block)


def run_hapcut2vcf(hapcut, vcf, output=sys.stdout):
    command_line = "(whatshap {}) {}".format(__version__, " ".join(sys.argv[1:]))
    with ExitStack() as stack:
        if isinstance(output, str):
            output = stack.enter_context(open(output, "w"))

        writer = PhasedVcfWriter(vcf, command_line, out_file=output)
        if len(writer.samples) > 1:
            # hapCUT does not support multi-sample VCFs
            raise CommandLineError("There is more than one sample in this VCF")
        sample = writer.samples[0]

        f = stack.enter_context(open(hapcut))
        parser = HapCutParser(f)
        for chromosome, blocks in parser:
            logger.info("Read %d phased blocks for chromosome %s", len(blocks), chromosome)

            # one Read per haplotype plus connected components
            haplotypes = [Read(str(i)) for i in (1, 2)]
            components = dict()
            for block in blocks:
                for variant in block:
                    haplotypes[0].add_variant(variant.position, variant.haplotype1, 0)
                    haplotypes[1].add_variant(variant.position, variant.haplotype2, 0)
                    components[variant.position] = variant.component_id

            sample_superreads = {sample: haplotypes}
            sample_components = {sample: components}
            writer.write(chromosome, sample_superreads, sample_components)


def main(args):
    run_hapcut2vcf(**vars(args))
