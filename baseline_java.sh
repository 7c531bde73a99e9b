#!/bin/sh
# Measure the NGSEP 4.3.2 Java baseline directly (requires a JVM host).
# Produces wall-clock for the align+genotype pipeline on the yeast
# tutorial data; reads/s = (reads in input fastq) / (t_align + t_call).
#
# Usage: baseline_java.sh <NGSEPcore.jar> <genome.fa> <reads.fastq.gz>
set -e
JAR=${1:?jar}; GENOME=${2:?genome fasta}; READS=${3:?reads fastq}
OUT=baseline_java_out
mkdir -p "$OUT"
echo "== GenomeIndexer =="
time java -Xmx8g -jar "$JAR" GenomeIndexer -i "$GENOME" -o "$OUT/genome"
echo "== ReadsAligner =="
time java -Xmx8g -jar "$JAR" ReadsAligner -i "$READS" -d "$OUT/genome" \
  -o "$OUT/aln.bam" -s sample1
echo "== sort =="
time java -Xmx4g -jar "$JAR" SortAlignment -i "$OUT/aln.bam" \
  -o "$OUT/aln_sorted.bam" 2>/dev/null || samtools sort -o "$OUT/aln_sorted.bam" "$OUT/aln.bam"
echo "== SingleSampleVariantsDetector =="
time java -Xmx8g -jar "$JAR" SingleSampleVariantsDetector -r "$GENOME" \
  -i "$OUT/aln_sorted.bam" -o "$OUT/calls" -sampleId sample1
n=$(zcat -f "$READS" | awk 'END{print NR/4}')
echo "reads: $n  -> reads/s = n / (align_s + call_s) from the times above"
