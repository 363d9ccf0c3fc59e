/* Third-party JPEG cross-validation harness (libjpeg-turbo).
 *
 * Two subcommands over stdin/stdout + argv:
 *
 *   encode <w> <h> <ncomp> <arith:0|1> <progressive:0|1> <quality>
 *          <restart> <h2v2:0|1>
 *     stdin:  w*h*ncomp raw bytes (gray or RGB, row-major)
 *     stdout: a JPEG stream produced by libjpeg-turbo (Huffman or
 *             arithmetic-coded, sequential or progressive).
 *
 *   dumpcoef
 *     stdin:  any JPEG stream libjpeg-turbo can parse
 *     stdout: exact quantized DCT coefficients via
 *             jpeg_read_coefficients() — no IDCT, no color convert:
 *             header line "NCOMP w_blocks h_blocks ..." then per
 *             component the int16 block array (natural order,
 *             little-endian), preceded by its quant table (64 u16).
 *
 * The coefficient dump is the integer-exact layer shared by every
 * conforming decoder, so it cross-validates the repo's pure-python
 * entropy decoders (Huffman AND arithmetic) against an independent
 * implementation without involving IDCT rounding differences.
 * Compiled on demand by tests/tools (gcc + libjpeg.so present);
 * fixtures it generates are committed so the suite never requires
 * the toolchain at run time.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static void die(const char *msg) {
  fprintf(stderr, "%s\n", msg);
  exit(1);
}

static unsigned char *read_all(FILE *f, size_t *n) {
  size_t cap = 1 << 20, len = 0;
  unsigned char *buf = malloc(cap);
  if (!buf) die("oom");
  for (;;) {
    if (len == cap) {
      cap *= 2;
      buf = realloc(buf, cap);
      if (!buf) die("oom");
    }
    size_t got = fread(buf + len, 1, cap - len, f);
    if (!got) break;
    len += got;
  }
  *n = len;
  return buf;
}

static int cmd_encode(int argc, char **argv) {
  if (argc != 8) die("encode args: w h ncomp arith prog quality restart h2v2");
  int w = atoi(argv[0]), h = atoi(argv[1]), nc = atoi(argv[2]);
  int arith = atoi(argv[3]), prog = atoi(argv[4]), qual = atoi(argv[5]);
  int restart = atoi(argv[6]), h2v2 = atoi(argv[7]);
  size_t need = (size_t)w * h * nc, got;
  unsigned char *raw = read_all(stdin, &got);
  if (got != need) die("raw size mismatch");

  struct jpeg_compress_struct cinfo;
  struct jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);
  unsigned char *out = NULL;
  unsigned long outlen = 0;
  jpeg_mem_dest(&cinfo, &out, &outlen);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = nc;
  cinfo.in_color_space = nc == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, qual, TRUE);
  cinfo.arith_code = arith ? TRUE : FALSE;
  cinfo.restart_interval = restart;
  cinfo.optimize_coding = (!arith && qual < 95) ? TRUE : FALSE;
  if (nc == 3 && !h2v2) {
    int ci;
    for (ci = 0; ci < 3; ci++) {
      cinfo.comp_info[ci].h_samp_factor = 1;
      cinfo.comp_info[ci].v_samp_factor = 1;
    }
  }
  if (prog) jpeg_simple_progression(&cinfo);
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = raw + (size_t)cinfo.next_scanline * w * nc;
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  fwrite(out, 1, outlen, stdout);
  return 0;
}

static int cmd_dumpcoef(void) {
  size_t n;
  unsigned char *data = read_all(stdin, &n);
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, n);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK)
    die("bad header");
  jvirt_barray_ptr *coefs = jpeg_read_coefficients(&cinfo);
  if (!coefs) die("read_coefficients failed");
  printf("NCOMP %d\n", cinfo.num_components);
  int ci;
  for (ci = 0; ci < cinfo.num_components; ci++) {
    jpeg_component_info *comp = &cinfo.comp_info[ci];
    JDIMENSION wb = comp->width_in_blocks, hb = comp->height_in_blocks;
    printf("COMP %d %u %u %d %d\n", ci, wb, hb,
           comp->h_samp_factor, comp->v_samp_factor);
    unsigned short qt[DCTSIZE2];
    int qi;
    for (qi = 0; qi < DCTSIZE2; qi++)
      qt[qi] = comp->quant_table ? comp->quant_table->quantval[qi] : 0;
    fwrite(qt, 2, DCTSIZE2, stdout);
    JDIMENSION by;
    for (by = 0; by < hb; by++) {
      JBLOCKARRAY rows = (cinfo.mem->access_virt_barray)(
          (j_common_ptr)&cinfo, coefs[ci], by, 1, FALSE);
      fwrite(rows[0], sizeof(JBLOCK), wb, stdout);
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int main(int argc, char **argv) {
  if (argc < 2) die("usage: jpeg_thirdparty encode|dumpcoef ...");
  if (!strcmp(argv[1], "encode")) return cmd_encode(argc - 2, argv + 2);
  if (!strcmp(argv[1], "dumpcoef")) return cmd_dumpcoef();
  die("unknown subcommand");
  return 1;
}
