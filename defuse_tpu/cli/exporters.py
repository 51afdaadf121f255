"""Result exporters and format converters (reference L9 utilities):
``results_to_circos_links.pl``, ``create_circos_data.pl``,
``qseq2fastq.pl``, ``fq_all2std.pl`` equivalents."""

from __future__ import annotations


def results_to_circos_links(results_path, out, *, filtered_only=False,
                            probability_threshold=0.5):
    """Circos link rows: chromosome/position pairs per fusion."""
    with open(results_path) as fh:
        header = fh.readline().rstrip("\n").split("\t")
        idx = {name: header.index(name) for name in
               ("cluster_id", "gene_chromosome1", "genomic_break_pos1",
                "gene_chromosome2", "genomic_break_pos2")
               if name in header}
        pidx = header.index("probability") if "probability" in header \
            else None
        for line in fh:
            f = line.rstrip("\n").split("\t")
            if filtered_only and pidx is not None and \
                    float(f[pidx]) <= probability_threshold:
                continue
            out.write("hs{} {} {} hs{} {} {}\n".format(
                f[idx["gene_chromosome1"]],
                f[idx["genomic_break_pos1"]],
                int(f[idx["genomic_break_pos1"]]) + 1,
                f[idx["gene_chromosome2"]],
                f[idx["genomic_break_pos2"]],
                int(f[idx["genomic_break_pos2"]]) + 1))


def expression_to_circos_points(expression: dict[str, float],
                                gene_models, out):
    """Per-gene expression as circos scatter points."""
    for gene in sorted(expression):
        if gene not in gene_models.genes:
            continue
        g = gene_models.genes[gene]
        out.write(f"hs{g.chromosome} {g.region[0]} {g.region[1]} "
                  f"{expression[gene]}\n")


def qseq2fastq(qseq_lines, out):
    """Illumina qseq -> fastq (``qseq2fastq.pl``): qualities are
    phred64 -> phred33 rebased; '.' bases become N."""
    for line in qseq_lines:
        f = line.rstrip("\n").split("\t")
        name = f"{f[0]}_{f[1]}:{f[2]}:{f[3]}:{f[4]}:{f[5]}#{f[6]}/{f[7]}"
        seq = f[8].replace(".", "N")
        qual = "".join(chr(ord(c) - 64 + 33) for c in f[9])
        out.write(f"@{name}\n{seq}\n+\n{qual}\n")


def solexa_to_std_quality(fastq_lines, out):
    """fq_all2std-style Solexa(+64) -> standard(+33) quality rebase."""
    for i, line in enumerate(fastq_lines):
        if i % 4 == 3:
            line = "".join(chr(max(33, ord(c) - 31))
                           for c in line.rstrip("\n")) + "\n"
        out.write(line)
