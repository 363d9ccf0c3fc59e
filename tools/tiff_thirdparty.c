/* Third-party TIFF cross-validation harness (system libtiff).
 *
 *   tiff_thirdparty dump <file.tif>
 *
 * Walks every directory (IFD): prints one header line
 *   "DIR <idx> <width> <length> <spp> <bits> <sampleformat>
 *    <compression> <planar> <tiled>"
 * then writes the decoded pixel bytes (all strips/tiles in order,
 * libtiff-native layout: predictors undone, rows still padded to the
 * strip/tile grid) to stdout as a length-prefixed blob.
 *
 * The system headers ship no tiffio.h here, so the public libtiff
 * 4.x API entry points used are declared locally (stable since 4.0).
 * This validates the repo's GeoTIFF writer against the reader real
 * consumers (GDAL/rasterio) link: LZW/DEFLATE/ZSTD/PackBits codecs,
 * horizontal + floating-point predictors, strip/tile organization,
 * classic + BigTIFF containers, and JPEG via libjpeg-turbo
 * (including the arithmetic-coded processes).
 */
#include <stdio.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef struct tiff TIFF;
extern TIFF *TIFFOpen(const char *, const char *);
extern void TIFFClose(TIFF *);
extern int TIFFGetField(TIFF *, uint32_t, ...);
extern int TIFFGetFieldDefaulted(TIFF *, uint32_t, ...);
extern int TIFFReadDirectory(TIFF *);
extern int TIFFIsTiled(TIFF *);
extern uint32_t TIFFNumberOfStrips(TIFF *);
extern uint32_t TIFFNumberOfTiles(TIFF *);
extern int64_t TIFFReadEncodedStrip(TIFF *, uint32_t, void *, int64_t);
extern int64_t TIFFReadEncodedTile(TIFF *, uint32_t, void *, int64_t);
extern int64_t TIFFStripSize(TIFF *);
extern int64_t TIFFTileSize(TIFF *);

#define TAG_WIDTH 256
#define TAG_LENGTH 257
#define TAG_BITS 258
#define TAG_COMPRESSION 259
#define TAG_SPP 277
#define TAG_PLANAR 284
#define TAG_SAMPLEFORMAT 339

static void die(const char *m) {
  fprintf(stderr, "%s\n", m);
  exit(1);
}

int tiff_write_main(int argc, char **argv);

int main(int argc, char **argv) {
  if (argc >= 2 && !strcmp(argv[1], "write"))
    return tiff_write_main(argc - 2, argv + 2);
  if (argc != 3 || strcmp(argv[1], "dump"))
    die("usage: dump <file> | write <file> ...");
  TIFF *tif = TIFFOpen(argv[2], "r");
  if (!tif) die("TIFFOpen failed");
  int dir = 0;
  do {
    uint32_t w = 0, h = 0;
    uint16_t spp = 1, bits = 8, fmt = 1, comp = 1, planar = 1;
    TIFFGetField(tif, TAG_WIDTH, &w);
    TIFFGetField(tif, TAG_LENGTH, &h);
    TIFFGetFieldDefaulted(tif, TAG_SPP, &spp);
    TIFFGetFieldDefaulted(tif, TAG_BITS, &bits);
    TIFFGetFieldDefaulted(tif, TAG_SAMPLEFORMAT, &fmt);
    TIFFGetFieldDefaulted(tif, TAG_COMPRESSION, &comp);
    TIFFGetFieldDefaulted(tif, TAG_PLANAR, &planar);
    int tiled = TIFFIsTiled(tif);
    printf("DIR %d %u %u %u %u %u %u %u %d\n", dir, w, h, spp, bits,
           fmt, comp, planar, tiled);
    fflush(stdout);
    if (tiled) {
      int64_t tsz = TIFFTileSize(tif);
      uint32_t n = TIFFNumberOfTiles(tif);
      unsigned char *buf = malloc(tsz);
      for (uint32_t i = 0; i < n; i++) {
        int64_t got = TIFFReadEncodedTile(tif, i, buf, tsz);
        if (got < 0) die("tile read failed");
        uint64_t g64 = (uint64_t)got;
        fwrite(&g64, 8, 1, stdout);
        fwrite(buf, 1, got, stdout);
      }
      free(buf);
    } else {
      int64_t ssz = TIFFStripSize(tif);
      uint32_t n = TIFFNumberOfStrips(tif);
      unsigned char *buf = malloc(ssz);
      for (uint32_t i = 0; i < n; i++) {
        int64_t got = TIFFReadEncodedStrip(tif, i, buf, ssz);
        if (got < 0) die("strip read failed");
        uint64_t g64 = (uint64_t)got;
        fwrite(&g64, 8, 1, stdout);
        fwrite(buf, 1, got, stdout);
      }
      free(buf);
    }
    uint64_t end = 0xFFFFFFFFFFFFFFFFULL;
    fwrite(&end, 8, 1, stdout);
    fflush(stdout);
    dir++;
  } while (TIFFReadDirectory(tif));
  TIFFClose(tif);
  return 0;
}

/* -------- writer mode (appended): validates the repo's READER
 * against files a real encoder produced --------
 *   tiff_thirdparty write <file> <w> <h> <spp> <bits> <fmt> <comp>
 *                   <predictor> <rps> <tiled:0|1>
 * reads w*h*spp samples (native-endian, bits/8 bytes each) from
 * stdin and writes them with libtiff's own codecs (LZW=5,
 * PackBits=32773, DEFLATE=8, ZSTD=50000, none=1). */
extern int TIFFSetField(TIFF *, uint32_t, ...);
extern int64_t TIFFWriteEncodedStrip(TIFF *, uint32_t, void *, int64_t);
extern int64_t TIFFWriteEncodedTile(TIFF *, uint32_t, void *, int64_t);
extern uint32_t TIFFComputeStrip(TIFF *, uint32_t, uint16_t);
extern uint32_t TIFFComputeTile(TIFF *, uint32_t, uint32_t, uint32_t,
                                uint16_t);

#define TAG_ROWSPERSTRIP 278
#define TAG_PREDICTOR 317
#define TAG_TILEWIDTH 322
#define TAG_TILELENGTH 323
#define TAG_PHOTOMETRIC 262
#define TAG_PLANARCONFIG 284

int tiff_write_main(int argc, char **argv) {
  if (argc != 10) die("write args: file w h spp bits fmt comp pred rps tiled");
  const char *path = argv[0];
  uint32_t w = atoi(argv[1]), h = atoi(argv[2]);
  uint16_t spp = atoi(argv[3]), bits = atoi(argv[4]), fmt = atoi(argv[5]);
  uint16_t comp = atoi(argv[6]), pred = atoi(argv[7]);
  uint32_t rps = atoi(argv[8]);
  int tiled = atoi(argv[9]);
  size_t esz = bits / 8;
  size_t need = (size_t)w * h * spp * esz;
  unsigned char *raw = malloc(need);
  if (fread(raw, 1, need, stdin) != need) die("short stdin");
  TIFF *tif = TIFFOpen(path, "w");
  if (!tif) die("TIFFOpen w failed");
  TIFFSetField(tif, TAG_WIDTH, w);
  TIFFSetField(tif, TAG_LENGTH, h);
  TIFFSetField(tif, TAG_SPP, spp);
  TIFFSetField(tif, TAG_BITS, bits);
  TIFFSetField(tif, TAG_SAMPLEFORMAT, fmt);
  TIFFSetField(tif, TAG_COMPRESSION, comp);
  TIFFSetField(tif, TAG_PHOTOMETRIC, (uint16_t)1);
  TIFFSetField(tif, TAG_PLANARCONFIG, (uint16_t)1);
  if (pred > 1) TIFFSetField(tif, TAG_PREDICTOR, pred);
  size_t rowb = (size_t)w * spp * esz;
  if (tiled) {
    uint32_t tw = 16, th = 16;
    TIFFSetField(tif, TAG_TILEWIDTH, tw);
    TIFFSetField(tif, TAG_TILELENGTH, th);
    unsigned char *tbuf = malloc((size_t)tw * th * spp * esz);
    for (uint32_t ty = 0; ty < h; ty += th)
      for (uint32_t tx = 0; tx < w; tx += tw) {
        memset(tbuf, 0, (size_t)tw * th * spp * esz);
        for (uint32_t r = 0; r < th && ty + r < h; r++) {
          uint32_t cs = (tx + tw <= w) ? tw : (w - tx);
          memcpy(tbuf + (size_t)r * tw * spp * esz,
                 raw + (size_t)(ty + r) * rowb
                     + (size_t)tx * spp * esz,
                 (size_t)cs * spp * esz);
        }
        if (TIFFWriteEncodedTile(tif, TIFFComputeTile(tif, tx, ty, 0, 0),
                                 tbuf, (int64_t)tw * th * spp * esz) < 0)
          die("tile write failed");
      }
    free(tbuf);
  } else {
    TIFFSetField(tif, TAG_ROWSPERSTRIP, rps);
    for (uint32_t r0 = 0, s = 0; r0 < h; r0 += rps, s++) {
      uint32_t rows = (r0 + rps <= h) ? rps : (h - r0);
      if (TIFFWriteEncodedStrip(tif, s, raw + (size_t)r0 * rowb,
                                (int64_t)rows * rowb) < 0)
        die("strip write failed");
    }
  }
  TIFFClose(tif);
  free(raw);
  return 0;
}
